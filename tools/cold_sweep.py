import sys, json, hashlib
sys.path.insert(0, '/root/repo')
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import duckdb, pandas as pd, numpy as np
import __ray_entry__ as e
SF = '/root/testdata/sf0.01'
q, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def vhash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            h.update(np.round(col.to_numpy(), 9).tobytes())
        else:
            h.update(pd.util.hash_pandas_object(col, index=False).to_numpy().tobytes())
    return h.hexdigest()
ok = fail = ronly = 0
for name in sorted(q):
    try:
        res = q[name](SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if name not in osql:
            ronly += 1; print(f"{name}: ROWS-ONLY {len(df)}"); continue
        odf = con.execute(osql[name]).fetchdf()
        rows = len(df) == len(odf)
        schema = sorted(df.columns) == sorted(odf.columns)
        h = vhash(df) == vhash(odf)
        if rows and schema and h:
            ok += 1
        else:
            fail += 1; print(f"{name}: FAIL rows={rows} schema={schema} hash={h} ({len(df)} vs {len(odf)})")
    except Exception as ex:
        fail += 1; print(f"{name}: ERROR {ex!r}")
print(f"SWEEP: {ok} OK, {fail} FAIL, {ronly} rows-only of {len(q)}")
ray.shutdown()
