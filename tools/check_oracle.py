#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
result parquet, run the matching oracle SQL in DuckDB over the source
tables, and compare rows / schema / hashes (order-insensitive).

Type-faithful: both sides are materialized as Arrow tables and every
column's *Arrow type* participates in the hash, so e.g. DuckDB's
HUGEINT (int128 -> decimal128) sum vs Spark's BIGINT (int64) is a
local FAIL even though the Python values collapse to equal ints.
This is what round 2 got wrong (local said green, driver said red).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query...]
"""
import sys, os, json, glob
import duckdb


def canon_type(t):
    """Arrow type -> canonical comparison name. Widths matter (int64 vs
    decimal128 differ); value-identical encodings (string vs large_string,
    timestamp tz spellings) are unified."""
    s = str(t)
    if s in ("large_string", "string_view"):
        return "string"
    if s.startswith("timestamp"):
        return s.replace(", tz=UTC", "").replace("[us, tz=+00]", "[us]")
    return s


def norm(v):
    if v is None:
        return "\x00NULL"      # never collides with the string 'None'
    if isinstance(v, float):
        return repr(v)          # exact bit-repr comparison for doubles
    if isinstance(v, bool):
        return "b:" + str(v)
    return str(v)


def arrow_of(rel):
    tbl = rel.arrow()
    cols = [f.name.lower() for f in tbl.schema]
    types = [canon_type(f.type) for f in tbl.schema]
    rows = [tuple(r[c] for c in tbl.schema.names) for r in tbl.to_pylist()]
    return cols, types, rows


def table_hash(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    head = "|".join(f"{cols[i]}:{types[i]}" for i in order)
    canon = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    h.update((head + "\n").encode())
    for row in canon:
        h.update(("|".join(row) + "\n").encode())
    return h.hexdigest()


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(res_dir, "*.parquet")):
            results[name] = "NO_SPARK_OUTPUT"
            continue
        try:
            s_cols, s_types, s_rows = arrow_of(con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'"))
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        try:
            o_cols, o_types, o_rows = arrow_of(con.execute(sql))
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {str(e)[:300]}"
            continue
        rows_match = len(s_rows) == len(o_rows)
        schema_match = sorted(s_cols) == sorted(o_cols)
        if not schema_match:
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(s_cols)} "
                             f"oracle={sorted(o_cols)}")
            continue
        s_tm = dict(zip(s_cols, s_types))
        o_tm = dict(zip(o_cols, o_types))
        bad_types = {c: (s_tm[c], o_tm[c]) for c in s_tm if s_tm[c] != o_tm[c]}
        if bad_types:
            results[name] = f"TYPE_MISMATCH {bad_types}"
            continue
        if not rows_match:
            results[name] = f"ROWS_MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
            continue
        hs = table_hash(s_rows, s_cols, s_types)
        ho = table_hash(o_rows, o_cols, o_types)
        if hs != ho:
            # find first differing row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
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
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
