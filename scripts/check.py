#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads every <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sf parquet tables,
sorts columns by name + rows by value, and compares cell-by-cell
(floats within 1e-9 relative, everything else exact).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", int(v))
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("d", str(v))
    except Exception:
        pass
    return ("s", str(v))

def cells_eq(a, b):
    if a is None or b is None:
        return a is b
    ta, va = a[0], a[1]
    tb, vb = b[0], b[1]
    if ta == "f" or tb == "f":
        try:
            fa, fb = float(va), float(vb)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if ta == "d" or tb == "d":
        from decimal import Decimal
        try:
            return Decimal(str(va)) == Decimal(str(vb))
        except Exception:
            return False
    if ta == "i" and tb == "i":
        return va == vb
    return (ta, va) == (tb, vb)

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
    for name in names:
        got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(grows)} rows")
            n_noracle += 1
            continue
        try:
            want = con.sql(oracles[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
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
            if not all(cells_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"✗ {name}: first diff at sorted-row {bad[0]}:")
            print(f"    spark : {bad[1]}")
            print(f"    duckdb: {bad[2]}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(gr)} rows match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
