#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/check_oracle.py <verifyOutDir> <sfDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the raw
testdata parquet, then compares: row count, column names (sorted), and
every value after sorting columns by name and rows by all columns.
Compares declared column types (DESCRIBE both sides) AND every value.

Two failure modes this replica canNOT see directly, both enforced as
hard FAILs instead:
- fetchdf() collapses DECIMALs to float64, hiding precision/scale skew
  (round-1 q1 failure). The DESCRIBE type compare covers that.
- The driver's hash canonicalizes decimal values with trailing-zero
  fractions (e.g. 65002.2870) differently per engine, so even
  type-and-value-identical DECIMAL outputs can hash-fail (round-2:
  7 queries). Policy since round 3: oracle-checked queries must not
  emit DECIMAL-typed output columns at all — do exact math in decimal,
  cast the final column to DOUBLE on both sides. Any DECIMAL output
  type is reported as a FAIL here even when values match.
"""
import sys, json, glob, os, re
import duckdb

# Committed-sidecar ordering contract (review r12): some oracles read
# model parquet the Scala side publishes via CommitProtocol (BPE merges,
# journey matrix, learned centroids). The rebuild window is guarded only
# by an in-JVM lock, so before executing such SQL we assert the glob
# matches at least one file AND every matched file sits in a directory
# carrying the _GRAFT_COMMITTED marker — a missing/half-built sidecar is
# reported as an ordering failure, not a confusing hash mismatch.
SIDECAR_GLOB = re.compile(r"read_parquet\('(/[^']+\.parquet)'\)")


def sidecar_problem(sql):
    # The glob spans ALL per-corpus sig dirs of a sidecar kind; an
    # unmarked dir may be crash residue from ANOTHER corpus's rebuild
    # (the SQL filters rows by corpus_sig), so only a glob with zero
    # marked dirs is a hard ordering failure — unmarked residue is
    # surfaced as a warning, not a FAIL.
    for g in SIDECAR_GLOB.findall(sql):
        files = glob.glob(g)
        if not files:
            return f"sidecar glob {g} matches no files (run Verify first)"
        dirs = {os.path.dirname(f) for f in files}
        marked = {d for d in dirs
                  if os.path.exists(os.path.join(d, "_GRAFT_COMMITTED"))}
        if not marked:
            return (f"no _GRAFT_COMMITTED dir under {g} — "
                    "sidecar not committed before the oracle ran")
        for d in sorted(dirs - marked):
            print(f"WARN: unmarked sidecar dir (stale rebuild residue?): {d}")
    return None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings; floats via repr for full precision
    def cell(v):
        if v is None:
            return "NULL"
        try:
            import math
            if isinstance(v, float) and math.isnan(v):
                return "NULL"
        except Exception:
            pass
        return repr(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_nosql = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got_cols, got_rows = canon(con, con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
        got_types = dict(con.sql(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})"
        ).fetchdf()[["column_name", "column_type"]].itertuples(index=False, name=None))
        if name not in oracle:
            status = "ROWS-ONLY" if len(got_rows) >= 0 else "?"
            print(f"{status} {name}: {len(got_rows)} rows (no oracle sql)")
            n_nosql += 1
            continue
        problem = sidecar_problem(oracle[name])
        if problem:
            print(f"FAIL {name}: {problem}")
            n_fail += 1
            continue
        try:
            exp_cols, exp_rows = canon(con, con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        exp_types = dict(con.sql(f"DESCRIBE {oracle[name]}"
                         ).fetchdf()[["column_name", "column_type"]].itertuples(index=False, name=None))
        if got_types != exp_types:
            print(f"FAIL {name}: types {got_types} != {exp_types}")
            n_fail += 1
            continue
        dec_cols = [c for c, t in got_types.items() if "DECIMAL" in t.upper()]
        if dec_cols:
            print(f"FAIL {name}: DECIMAL output columns {dec_cols} — "
                  "driver hash canonicalization is unsafe for decimals; "
                  "cast the final column to DOUBLE on both sides")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got_rows)} rows differ; first: got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(got_rows)} rows, {len(got_cols)} cols")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_nosql} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
