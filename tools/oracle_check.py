#!/usr/bin/env python3
"""Local stand-in for the driver's CORRECTNESS gate.

Runs each oracle SQL from <out>/oracle_sql.json in DuckDB over the
same parquet tables Spark read, loads the Spark result parquet from
<out>/<name>/, sorts columns by name, sorts rows, and compares
row-count / schema / value-hash per query.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        # relative precision, not fixed 4dp: the constructions are
        # designed bit-identical across engines, and 4dp would let real
        # divergence below ~1e-4 (e.g. small quantization scales) pass
        return format(v, ".12g")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


fails = 0
for name in sorted(oracles):
    sql = oracles[name].replace("{OUT}", out_dir)
    spark_glob = os.path.join(out_dir, name, "*.parquet")
    try:
        orc = con.execute(sql)
        o_cols = [d[0] for d in orc.description]
        o_rows = orc.fetchall()
        sp = con.execute(f"SELECT * FROM '{spark_glob}'")
        s_cols = [d[0] for d in sp.description]
        s_rows = sp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: err {e}")
        fails += 1
        continue
    rows_ok = len(o_rows) == len(s_rows)
    schema_ok = sorted(o_cols) == sorted(s_cols)
    hash_ok = schema_ok and table_hash(o_cols, o_rows) == table_hash(s_cols, s_rows)
    # Driver-compat lint: the graded harness compares PANDAS frames, not
    # python tuples. Two divergences fetchall() tolerates but pandas
    # doesn't (both bit us in round 4):
    #  1. DuckDB HUGEINT (uncast sum) -> pandas float64 -> the driver
    #     hashes '20000.0' against Spark's '20000'. Detect: one side's
    #     dtype is floating, the other's is integer.
    #  2. array-typed columns -> pandas object cells hold numpy arrays ->
    #     the driver's sort_values crashes (unhashable ndarray). Detect:
    #     run the same sort_values.
    compat_errs = []
    try:
        o_pdf = con.execute(sql).df()
        s_pdf = con.execute(f"SELECT * FROM '{spark_glob}'").df()
        for c in sorted(set(o_cols) & set(s_cols)):
            od, sd = o_pdf[c].dtype, s_pdf[c].dtype
            import pandas.api.types as pt
            if (pt.is_float_dtype(od) != pt.is_float_dtype(sd)) and (
                pt.is_numeric_dtype(od) and pt.is_numeric_dtype(sd)
            ):
                compat_errs.append(f"dtype drift on '{c}': oracle {od} vs spark {sd}")
        for side, pdf in (("oracle", o_pdf), ("spark", s_pdf)):
            try:
                pdf.sort_values(by=sorted(pdf.columns), kind="mergesort")
            except Exception as e:
                compat_errs.append(f"{side} frame unsortable by driver: {e}")
    except Exception as e:
        compat_errs.append(f"pandas conversion failed: {e}")
    if compat_errs:
        fails += 1
        print(f"FAIL {name}: driver-compat: " + "; ".join(compat_errs))
        continue
    if rows_ok and schema_ok and hash_ok:
        print(f"ok   {name}: rows={len(s_rows)}")
    else:
        fails += 1
        print(
            f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}, "
            f"schema_ok={schema_ok} ({sorted(s_cols)} vs {sorted(o_cols)}), hash_ok={hash_ok}"
        )
print(f"\n{len(oracles) - fails}/{len(oracles)} green")
sys.exit(1 if fails else 0)
