#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate — STRICT.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Mirrors the driver's compare (validated round 1: the driver floats the
DuckDB side — HUGEINT and DECIMAL become float64 — while the Spark side
keeps the typed parquet values; both are then serialized and hashed, so a
scale-2 decimal '134122313.70' vs floated '134122313.7' is a MISMATCH even
though the values are equal):

  - Spark side: read the parquet verbatim (int64 stays int, DECIMAL stays
    Decimal with its scale, double stays float).
  - Oracle side: run the SQL in DuckDB, then float any HUGEINT/DECIMAL
    column (the driver-observed coercion).
  - Serialize every cell to a canonical string and compare EXACTLY.
    No float tolerance: if the driver would hash-mismatch, we fail.

On a strict mismatch, a secondary value-tolerant diff reports whether the
values are actually equal (i.e. the failure is a boundary-typing bug, the
round-1 failure class) or a genuine value error.
"""
import sys, os, json, math, datetime
from decimal import Decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle_coerce(rows, type_names):
    """Apply the driver's observed coercion to a DuckDB result: HUGEINT and
    DECIMAL columns become float64."""
    floaty = [t.upper().startswith("DECIMAL") or t.upper() in ("HUGEINT", "UHUGEINT")
              for t in type_names]
    out = []
    for r in rows:
        out.append(tuple(float(v) if (floaty[i] and v is not None) else v
                         for i, v in enumerate(r)))
    return out


def ser(v):
    """Canonical serialization — distinct types serialize distinctly, the
    way the driver's hasher sees them."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(ser(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(ser(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def values_equalish(a, b):
    """Diagnostic only: are the two serialized cells equal as VALUES
    (1e-9 relative for numerics)?"""
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    # A query that THREW in Verify writes no output dir, only a ._FAILED
    # marker — without this check it would silently vanish from the tally
    # (masked a real engine-level failure once: q_session_window vs the
    # regenerated TIMESTAMP_NTZ testdata).
    for marker in sorted(f for f in os.listdir(out_dir)
                         if f.endswith("._FAILED")):
        with open(os.path.join(out_dir, marker)) as mf:
            msg = mf.read().strip()[:200]
        print(f"✗ {marker[:-8]}: Verify threw: {msg}")
        n_fail += 1
    for name in names:
        got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gcols = list(got.columns)
        grows = got.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(grows)} rows")
            n_noracle += 1
            continue
        try:
            want = con.sql(oracles[name])
            wcols = list(want.columns)
            wtypes = [str(t) for t in want.types]
            wrows = want.fetchall()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        wrows = oracle_coerce(wrows, wtypes)
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"✗ {name}: column mismatch spark={gc} duckdb={wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"✗ {name}: row count spark={len(gr)} duckdb={len(wr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, wr)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            vals_ok = all(values_equalish(x, y) for x, y in zip(a, b))
            kind = "BOUNDARY-TYPE ONLY (values equal)" if vals_ok else "VALUE DIFF"
            print(f"✗ {name}: strict diff at sorted-row {i} [{kind}]:")
            print(f"    spark : {a}")
            print(f"    duckdb: {b}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(gr)} rows strict-match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
