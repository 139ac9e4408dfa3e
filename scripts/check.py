#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB differential oracle.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<query>/ parquet written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the
sf_dir tables, and compares: columns sorted by name, rows sorted by
all columns, exact value equality. Reports dtype mismatches too (the
driver hash-compares, so a BIGINT vs INT difference may matter).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # fetchdf flattens DECIMAL to float64, hiding representational
        # divergence the driver's byte-hash WILL see (q123 shipped that
        # way). Reject raw-DECIMAL output columns on either side.
        dec_got = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            if "DECIMAL" in r[1].upper()]
        if dec_got:
            print(f"FAIL {name}: raw DECIMAL output columns {dec_got} "
                  f"(driver hash canonicalizes parquet DECIMAL and DuckDB "
                  f"DECIMAL differently — cast to BIGINT/DOUBLE)")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            continue
        try:
            dec_exp = [r[0] for r in con.execute(
                f"DESCRIBE {oracles[name]}").fetchall()
                if "DECIMAL" in r[1].upper() or "HUGEINT" in r[1].upper()]
            if dec_exp:
                print(f"FAIL {name}: oracle yields DECIMAL/HUGEINT columns "
                      f"{dec_exp} — add CAST(... AS BIGINT/DOUBLE)")
                n_fail += 1
                continue
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        dtype_diff = [(c, str(got[c].dtype), str(exp[c].dtype))
                      for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL {name}: rows {len(gs)} != {len(es)}")
            n_fail += 1
            continue
        if gs.equals(es):
            # Value equality isn't enough: the driver hash-compares the
            # FORMATTED values, where -0.0 != 0.0. Check float columns
            # bit-for-bit so signed-zero divergence fails locally too.
            bit_diff = []
            for c in gs.columns:
                a, b = gs[c].to_numpy(), es[c].to_numpy()
                if a.dtype.kind == "f" and b.dtype.kind == "f" \
                        and a.tobytes() != b.tobytes():
                    bit_diff.append(c)
            if bit_diff:
                print(f"FAIL {name}: float bit-pattern mismatch "
                      f"(-0.0 vs 0.0?) in {bit_diff}")
                n_fail += 1
                continue
            note = f" [dtype diffs: {dtype_diff}]" if dtype_diff else ""
            print(f"PASS {name}: {len(gs)} rows{note}")
            n_pass += 1
        else:
            neq = (gs != es) & ~(gs.isna() & es.isna())
            bad_cols = [c for c in gs.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"   {c} row{idx}: got={gs[c][idx]!r} exp={es[c][idx]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracles)} oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
