import duckdb, json, sys, glob, os, hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not glob.glob(f"{spark_path}/*.parquet"):
        fails.append((name, "no spark output")); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    # driver compare: sort columns by name, then hash sorted rows
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"schema: spark={scols} oracle={ocols}")); continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows: spark={len(sdf)} oracle={len(odf)}")); continue
    # mirror the DRIVER's comparator, which sort_values the RAW columns:
    # a top-level array column is unhashable there (r5 red rows) even
    # though the stringified hash below would pass — fail like the driver
    try:
        sdf.sort_values(by=scols); odf.sort_values(by=ocols)
    except TypeError as e:
        fails.append((name, f"driver comparator would fail on raw sort: {e}")); continue
    def canon(df):
        d = df[scols].astype(str)
        rows = sorted(["|".join(r) for r in d.values.tolist()])
        return hashlib.md5("\n".join(rows).encode()).hexdigest()
    hs, ho = canon(sdf), canon(odf)
    if hs != ho:
        # show first diffs
        ss = set("|".join(r) for r in sdf[scols].astype(str).values.tolist())
        oo = set("|".join(r) for r in odf[scols].astype(str).values.tolist())
        diff = list(ss - oo)[:3] + ["---"] + list(oo - ss)[:3]
        fails.append((name, "hash mismatch: " + "; ".join(diff)))
    else:
        print(f"OK   {name} ({len(sdf)} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why[:500]}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
