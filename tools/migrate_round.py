#!/usr/bin/env python3
"""Rewrite round(EXPR, n) to the engine-stable floor form (r11 burn-down).

round(DOUBLE, n) tie behavior drifted across DuckDB versions (the r7
q_cov_matrix red row), so oracle SQL and the Spark side both move to
floor(x * 1en + 0.5) / 1en, which is deterministic given identical input
doubles. This script rewrites BOTH contexts inside a .scala file:

  - inside a triple-quoted SQL string:  round(E, n) -> floor((E) * 1en + 0.5) / 1en
  - in Scala Column code:               round(E, n) -> (floor((E) * lit(1en) + lit(0.5)) / lit(1en))

Skips comment lines (` * `, `//`) and one-arg round() (handled case by
case — integer quantizers need floor(x + 0.5), not a scale).

Usage: migrate_round.py <file> [--apply] [--only substr]
Default is a dry run printing each planned rewrite with 60 chars of
context; --apply writes the file. --only limits to occurrences whose
surrounding 200 chars contain the substring (to scope to one query).
"""
import re
import sys


def find_matching(s, i):
    """i points at '('; return index just past the matching ')'."""
    depth = 0
    while i < len(s):
        c = s[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def split_last_top_comma(inner):
    depth = 0
    last = -1
    for i, c in enumerate(inner):
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif c == ',' and depth == 0:
            last = i
    if last < 0:
        return None
    return inner[:last], inner[last + 1:]


def in_triple_string(s, pos):
    return s.count('"""', 0, pos) % 2 == 1


def line_of(s, pos):
    start = s.rfind('\n', 0, pos) + 1
    end = s.find('\n', pos)
    return s[start:end if end >= 0 else len(s)]


def main():
    path = sys.argv[1]
    apply = '--apply' in sys.argv
    only = None
    if '--only' in sys.argv:
        only = sys.argv[sys.argv.index('--only') + 1]
    s = open(path).read()
    out = []
    pos = 0
    nrew = 0
    for m in list(re.finditer(r'(?<![\w.])round\(', s)):
        start = m.start()
        if start < pos:
            continue
        ln = line_of(s, start).lstrip()
        if ln.startswith('*') or ln.startswith('//'):
            continue
        if only and only not in s[max(0, start - 200):start + 200]:
            continue
        end = find_matching(s, m.end() - 1)
        inner = s[m.end():end - 1]
        parts = split_last_top_comma(inner)
        if parts is None:
            continue  # one-arg round: handled manually
        expr, scale = parts
        scale = scale.strip()
        if not re.fullmatch(r'\d+', scale):
            continue
        sql = in_triple_string(s, start)
        if sql:
            new = f"floor(({expr}) * 1e{scale} + 0.5) / 1e{scale}"
        else:
            new = (f"(floor(({expr}) * lit(1e{scale}) + lit(0.5)) / "
                   f"lit(1e{scale}))")
        nrew += 1
        ctx = s[max(0, start - 40):start].replace('\n', '\\n')[-40:]
        print(f"[{'SQL' if sql else 'SCALA'}] ...{ctx} :: round({inner[:60]}"
              f"{'...' if len(inner) > 60 else ''}, {scale})")
        out.append(s[pos:start])
        out.append(new)
        pos = end
    out.append(s[pos:])
    print(f"{nrew} rewrites in {path}")
    if apply:
        open(path, 'w').write(''.join(out))
        print("applied")


if __name__ == '__main__':
    main()
