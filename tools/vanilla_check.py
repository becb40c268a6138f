"""Vanilla-session smoke of the special execution paths (Arrow/pandas,
LSH, salted agg) — mirrors the driver's plain SparkSession."""

import importlib.util
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
qs = mod.queries()
for name in [
    "q28_multimodal_plumbing",
    "q42_corpus_clean",
    "q45_stratified_sample",
    "q50_salted_aggregation",
    "q47_asof_tolerance",
    # round-4 continuation special paths: lake protocol, window-heavy,
    # pointer-doubling iteration, sketch arrays, prefix-filter blocking
    "q91_fuzzy_linkage",
    "q93_kmv_set_algebra",
    "q100_lake_pruned_read",
    "q113_incremental_join_view",
    "q114_partitioned_lake_upsert",
    "q117_hierarchy_flatten",
]:
    n = len(qs[name](spark, "/root/testdata/sf0.01").collect())
    print(name, "ROWS", n)
