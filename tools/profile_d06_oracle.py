import duckdb, os, sys, time
sys.path.insert(0,'/root/repo')
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES
from mxene_coin_cell_data_pipeline_spark.plans.q_dedup_pairs import _D02_PAIRS_LIST_SQL

sf = '/tmp/sf100x'
con = duckdb.connect()
con.execute("SET memory_limit='48GB'")
os.makedirs('/tmp/duckdb_d06prof', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_d06prof'")
con.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('/tmp/sf100x/documents.parquet/*.parquet')")

t0=time.time()
try:
    n = con.execute(f"SELECT count(*) FROM ({_D02_PAIRS_LIST_SQL})").fetchone()[0]
    print("PAIRS_ONLY", n, round(time.time()-t0,1), flush=True)
except Exception as e:
    print("PAIRS_FAIL", repr(e)[:300], round(time.time()-t0,1), flush=True)
    raise SystemExit(1)

# phase 2: materialize pairs to a temp table, then run ONLY the l-chain
t0=time.time()
con.execute(f"CREATE TEMP TABLE pairs_t AS ({_D02_PAIRS_LIST_SQL})")
print("PAIRS_TABLE", round(time.time()-t0,1), flush=True)

from mxene_coin_cell_data_pipeline_spark.plans.q_dedup_pairs import _closure_audit_oracle
chain = _closure_audit_oracle("SELECT doc_a, doc_b FROM pairs_t")
t0=time.time()
try:
    r = con.execute(f"SELECT count(*) FROM ({chain})").fetchone()[0]
    print("CHAIN_ONLY", r, round(time.time()-t0,1), flush=True)
except Exception as e:
    print("CHAIN_FAIL", repr(e)[:300], round(time.time()-t0,1), flush=True)

# ---------------------------------------------------------------------
# Round-9 status: launched at 100x/48GB this session; the pairs phase
# alone had not completed after ~40 min when the run was stopped to
# keep the host idle for the driver's bench. At 10x the FULL oracle
# needs only 8GB / 39s (measured), so the blow-up is 100x-specific.
# Next round: run `python tools/profile_d06_oracle.py` solo (regenerate
# /tmp/sf100x first), read which phase binds, and restate that phase —
# candidates: fewer label rounds w/ certificate (if CHAIN binds) or a
# sampled-stratum certificate audit (if PAIRS binds).
# ---------------------------------------------------------------------
