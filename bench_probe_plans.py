"""Dump .explain('formatted') for the bench-path stage builds (r6 evidence).

Writes plans/r06/<name>_{before,after}.txt depending on --tag.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import similarity as S  # noqa: E402
from entity_matching_in_online_retail_spark.operators import blocking as B  # noqa: E402
from entity_matching_in_online_retail_spark.operators import features as FE  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--tag", default="before")
ap.add_argument("--queries", action="store_true", help="also dump the bench q_* corpus query plans")
args = ap.parse_args()

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_plans", cores=cores, shuffle_partitions=2 * cores)
corpus = os.path.join(REPO, ".bench_cache", "corpus_e20000")
pages = spark.read.parquet(os.path.join(corpus, "web_pages"))
outdir = os.path.join(REPO, "plans", "r06")
os.makedirs(outdir, exist_ok=True)
cfg = DEFAULT_CONFIG
n = cfg.n_checkpoint_partitions

workdir = tempfile.mkdtemp(prefix="er_plans_")
pipe = ERPipeline(spark, workdir)


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"dumped {name}_{args.tag}: {buf.getvalue().count('Exchange')} Exchange, "
          f"{buf.getvalue().count('EvalPython')} EvalPython nodes", flush=True)


# stage builds (pre-write dataflow, the timed computation)
offers_build = normalize_web_pages(pages, lang=cfg.lang_filter, use_html=True).withColumn(
    "part_id", F.pmod(F.xxhash64("url"), F.lit(n)).cast("int")
)
dump("er_ingest_normalize", offers_build)

offers = pipe.stage_offers(pages, use_html=True)
idf = S.fit_idf(offers)
pipe.catalog.write(idf, "idf", mode="overwrite")
idf_m = pipe.catalog.read("idf")
dump("er_tfidf_vectors", FE.offers_with_vectors(offers, idf_m))

keys = B.all_block_keys(offers, cfg.blocking)
dump("er_block_keys", keys)
capped = B.cap_blocks(keys, cfg.blocking).localCheckpoint(eager=True)
dump("er_block_pairs", B.candidate_pairs(capped, cfg.blocking))

attrs = pipe.stage_attrs(offers)
pairs = pipe.stage_pairs(offers)
n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
feats = FE.pair_features(
    pairs.select("id_l", "id_r").repartition(n_part, "id_l", "id_r"),
    attrs,
    gate_jaccard=cfg.scoring.gate_jaccard,
)
from entity_matching_in_online_retail_spark.plans.pipeline import DEFAULT_MATCHER  # noqa: E402

dump("er_score_pairs", M.score_pairs(feats, DEFAULT_MATCHER))

if args.queries:
    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for qname in ["groupby_count", "fetch_join", "self_join_block", "window_topk",
                  "ann_bruteforce", "token_df", "curation_funnel"]:
        dump(f"q_{qname}", E.queries()[qname](spark, sf_dir))

import shutil

shutil.rmtree(workdir, ignore_errors=True)
spark.stop()
