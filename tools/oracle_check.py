import duckdb, json, sys, glob, os

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_r2'
sf = sys.argv[2] if len(sys.argv) > 2 else '0.01'
only = sys.argv[3].split(',') if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f'/root/testdata/sf{sf}/*.parquet'):
    t = os.path.basename(p).replace('.parquet','')
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    if only and name not in only: continue
    spark = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracles:
        results[name] = f"no_oracle rows={len(spark)}"
        continue
    try:
        ora = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_ERR {e}"
        continue
    sc = sorted(spark.columns); oc = sorted(ora.columns)
    if sc != oc:
        results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        continue
    if len(spark) != len(ora):
        results[name] = f"ROWS_MISMATCH spark={len(spark)} oracle={len(ora)}"
        continue
    a = sorted(tuple(str(x) for x in row) for row in spark[sc].itertuples(index=False))
    b = sorted(tuple(str(x) for x in row) for row in ora[oc].itertuples(index=False))
    if a == b:
        results[name] = f"OK rows={len(a)}"
    else:
        diff = [(x, y) for x, y in zip(a, b) if x != y]
        results[name] = f"HASH_MISMATCH rows={len(a)} ndiff={len(diff)} first={diff[0] if diff else ''}"
for k, v in results.items():
    print(f"{k}: {v}")
