#!/usr/bin/env python3
"""Local replica of the driver's t2 check: run each oracle SQL in DuckDB
over the sf tables, compare against graft.Verify's parquet dumps.
Dev tool only — the Scala library never depends on this.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    """Sort columns by name, stringify values canonically, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            elif isinstance(v, bytes):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    keys = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    for k in keys:
        res = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{k}/*.parquet')")
        scols, srows = canon(res.fetchall(), list(res.columns))
        if k not in oracles:
            print(f"  [rows-only] {k}: {len(srows)} rows {'OK' if len(srows) > 0 else 'EMPTY!'}")
            continue
        try:
            ores = con.sql(oracles[k])
            # Representation guard: the driver's compare reads the two sides
            # through different stacks (pyarrow vs duckdb->pandas), and
            # DECIMAL / HUGEINT / nested-list results stringify differently
            # there even when values are equal (round-1 lesson). Flag them
            # here so local green actually predicts driver green.
            risky = [(c, str(t)) for c, t in zip(ores.columns, ores.types)
                     if str(t) in ("HUGEINT", "UHUGEINT")
                     or str(t).startswith("DECIMAL") or "[]" in str(t)]
            if risky:
                print(f"✗ {k}: RISKY ORACLE TYPES {risky} (would hash-mismatch on the driver)")
                n_fail += 1
                continue
            ocols, orows = canon(ores.fetchall(), list(ores.columns))
        except Exception as e:
            print(f"✗ {k}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"✗ {k}: SCHEMA {scols} vs oracle {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"✗ {k}: ROWS {len(srows)} vs oracle {len(orows)}")
            n_fail += 1
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"✗ {k}: VALUE mismatch at sorted row {bad}:")
            print(f"    spark:  {srows[bad][:300]}")
            print(f"    oracle: {orows[bad][:300]}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"✓ {k} ({len(srows)} rows)")
    missing = set(oracles) - set(keys)
    if missing:
        print(f"! oracle keys with no dump (query failed?): {sorted(missing)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(missing)} missing")
    return 1 if (n_fail or missing) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
