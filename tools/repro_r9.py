"""Deterministic repros for the r8 verdict's two DV bugs.

1. MOR whole-file drop data loss: deletes k%3=1; k%3=2; k%8=0; k%2=0
   on a 120-row 3-file dv.enabled table must stay row-identical to COW
   at every version (judge saw 12 rows instead of 20 at the tip).
2. count_rows undercount: deletes k%10=1; k<10 AND k%10=2; k%10=3 on a
   100-row dv.enabled table — count_rows must equal the real read
   count (judge measured 94 vs 95).
"""
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="r9repro_")
ok = True

# --- repro 1: MOR == COW under the falsifying delete sequence ----------
base = spark.range(120).selectExpr(
    "CAST(id AS INT) AS k", "CONCAT('v', id) AS v").repartition(3)
cow, mor = f"{tmp}/cow", f"{tmp}/mor"
versioned.write_version(base, cow, stats_col="k")
versioned.write_version(base, mor, stats_col="k")
versioned.set_table_property(mor, "dv.enabled", "true")
for pred in ["k % 3 = 1", "k % 3 = 2", "k % 8 = 0", "k % 2 = 0"]:
    versioned.delete_where(spark, cow, pred)
    versioned.delete_where(spark, mor, pred)


def _rows(path, version=None):
    return sorted(tuple(r) for r in
                  versioned.read_version(spark, path, version).collect())


vs_cow, vs_mor = versioned.versions(cow), versioned.versions(mor)
for i, vc in enumerate(vs_cow):
    vm = vs_mor[i + 1] if i else vs_mor[0]
    rc, rm = _rows(cow, vc), _rows(mor, vm)
    crc = versioned.count_rows(spark, cow, vc)
    crm = versioned.count_rows(spark, mor, vm)
    status = "OK " if (rc == rm and crc == len(rc) and crm == len(rm)) \
        else "FAIL"
    if status == "FAIL":
        ok = False
    print(f"[1] v{vc}/v{vm}: cow={len(rc)} mor={len(rm)} "
          f"count_rows cow={crc} mor={crm}  {status}")
    if rc != rm:
        missing = sorted(set(rc) - set(rm))
        print(f"    missing from MOR: {[t[0] for t in missing]}")

# --- repro 2: count_rows vs real count on partial-touch chain ----------
t2 = f"{tmp}/t2"
base2 = spark.range(100).selectExpr(
    "CAST(id AS INT) AS k", "CONCAT('v', id) AS v").repartition(3)
versioned.write_version(base2, t2, stats_col="k")
versioned.set_table_property(t2, "dv.enabled", "true")
for pred in ["k % 10 = 1", "k < 10 AND k % 10 = 2", "k % 10 = 3"]:
    versioned.delete_where(spark, t2, pred)
real = versioned.read_version(spark, t2).count()
meta = versioned.count_rows(spark, t2)
status = "OK " if real == meta else "FAIL"
if real != meta:
    ok = False
print(f"[2] read={real} count_rows={meta}  {status}")

# duplicate (file,pos) audit over current sidecars
m = versioned._load_manifest(t2, versioned.versions(t2)[-1])
import os  # noqa: E402
pairs = set()
dup = 0
for f, sidecars in versioned._dv_map(m).items():
    seen_for_f = set()
    for s in sidecars:
        df = spark.read.parquet(versioned._abs_file(t2, s))
        for r in df.collect():
            p = (os.path.normpath(versioned._uri_to_path(r["file"])),
                 r["pos"])
            if p[0] != os.path.normpath(versioned._abs_file(t2, f)):
                continue
            if p in seen_for_f:
                dup += 1
            seen_for_f.add(p)
print(f"[2] duplicate (file,pos) in current vectors: {dup} "
      f"{'OK ' if dup == 0 else 'FAIL'}")
if dup:
    ok = False

shutil.rmtree(tmp, ignore_errors=True)
print("ALL OK" if ok else "REPRODUCED FAILURES")
sys.exit(0 if ok else 1)
