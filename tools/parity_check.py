#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness compare.

Runs each oracle_sql.json entry in DuckDB over the same sf dir and
compares to the parquet the Verify main dumped: schema (column names),
row count, and a hash of values with columns sorted by name.
"""
import sys, json, glob, math, hashlib
import duckdb, pyarrow as pa, pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool): return str(int(v))
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    # concatenate ALL part files — a multi-part result compared against
    # only part 0 would report spurious row/hash failures
    tb = pa.concat_tables([pq.read_table(f) for f in files])
    scols = tb.column_names
    srows = [tuple(r[c] for c in scols) for r in tb.to_pylist()]
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    h1, h2 = canon(scols, srows), canon(ocols, orows)
    if h1 != h2:
        print(f"FAIL {name}: hash mismatch ({len(srows)} rows)"); fails += 1
        # show first differing line
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        s = sorted(",".join(norm(r[i]) for i in order) for r in srows)
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        o = sorted(",".join(norm(r[i]) for i in oorder) for r in orows)
        for a, b in zip(s, o):
            if a != b:
                print(f"  spark:  {a[:200]}\n  oracle: {b[:200]}"); break
        continue
    print(f"PASS {name} ({len(srows)} rows)")
print(f"{'ALL PASS' if fails==0 else str(fails)+' FAILURES'}")
sys.exit(1 if fails else 0)
