#!/usr/bin/env python3
"""Sort-determinism audit: flags oracle queries whose ORDER BY does not
totally order the result (rows tie on the sort keys but differ in other
columns). Such keys pass the hash compare only while BOTH engines
stable-sort ties in file order — environment drift (engine versions,
partition counts) can silently flip them. Run after adding keys:
    python3 scripts/audit_order.py [sfDir] [verifyOut]
The ORDER BY parser is last-clause/alias-based and can misread complex
tails ("parse-skip" lines); treat only TIE findings as actionable."""
import sys, json, re
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
ties, skipped = [], []
for name, sql in sorted(oracle.items()):
    m = re.search(r'ORDER BY\s+([^)]+?)(LIMIT\s+\d+)?\s*$', sql, re.S | re.I)
    if not m:
        # the [^)]+? tail regex can't parse an ORDER BY containing ')'
        # (function calls in the sort keys); that's a parse limitation,
        # not a missing ORDER BY — report as skip, not actionable TIE.
        # But only if the LAST ORDER BY is a top-level one: balanced
        # parens after it. An ORDER BY living inside a window OVER(...)
        # leaves an unmatched ')' in its tail and does NOT order the
        # result — that stays an actionable finding.
        last = None
        for mm in re.finditer(r'ORDER BY', sql, re.I):
            last = mm.end()
        # strip string literals before counting: a paren INSIDE a
        # quoted literal must not make a top-level ORDER BY look nested
        tail = re.sub(r"'[^']*'", "''", sql[last:]) if last is not None else ""
        if last is not None and tail.count('(') == tail.count(')'):
            skipped.append(name)
            continue
        df = con.sql(sql).df()
        if len(df) > 1:
            ties.append((name, "NO final ORDER BY and more than one row"))
        continue
    cols = [re.sub(r'\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$', '',
                   c.strip(), flags=re.I)
            for c in m.group(1).split(',')]
    try:
        df = con.sql(sql).df()
        names = [df.columns[int(c) - 1] if c.isdigit() else c for c in cols]
        if not all(n in df.columns for n in names):
            skipped.append(name)
            continue
        tied = df[df.duplicated(subset=names, keep=False)]
        full = df[df.duplicated(keep=False)]
        if len(tied) > len(full):
            ties.append((name, f"{len(tied) - len(full)} rows tie on "
                               f"{names} with differing payloads"))
    except Exception:
        skipped.append(name)
print(f"parse-skipped (verify manually): {len(skipped)}")
for n, why in ties:
    print(f"TIE {n}: {why}")
print(f"\n{len(ties)} actionable finding(s)")
sys.exit(1 if ties else 0)
