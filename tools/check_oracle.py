#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
result parquet, run the matching oracle SQL in DuckDB over the source
tables, and compare rows / schema / hashes (order-insensitive).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb

def norm(v):
    if isinstance(v, float):
        return repr(v)          # exact bit-repr comparison for doubles
    if isinstance(v, bool):
        return "b:" + str(v)
    return str(type(v).__name__[:1]) + ":" + str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in canon:
        h.update(("|".join(row) + "\n").encode())
    return h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(res_dir, "*.parquet")):
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {str(e)[:300]}"
            continue
        rows_match = len(s_rows) == len(o_rows)
        schema_match = sorted(c.lower() for c in s_cols) == \
                       sorted(c.lower() for c in o_cols)
        if not schema_match:
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(s_cols)} "
                             f"oracle={sorted(o_cols)}")
            continue
        if not rows_match:
            results[name] = f"ROWS_MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
            continue
        hs = table_hash(s_rows, [c.lower() for c in s_cols])
        ho = table_hash(o_rows, [c.lower() for c in o_cols])
        if hs != ho:
            # find first differing row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i].lower())
            cs = sorted(tuple(norm(r[i]) for i in order_s) for r in s_rows)
            co = sorted(tuple(norm(r[i]) for i in order_o) for r in o_rows)
            diff = next(((a, b) for a, b in zip(cs, co) if a != b),
                        ("<all common prefix>", "<...>"))
            results[name] = (f"HASH_MISMATCH rows={len(s_rows)}\n"
                             f"    spark : {diff[0]}\n    oracle: {diff[1]}")
        else:
            results[name] = f"OK rows={len(s_rows)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in results.items():
        mark = "PASS" if v.startswith("OK") else "FAIL"
        print(f"[{mark}] {name}: {v}")
    print(f"\n{n_ok}/{len(results)} green")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
