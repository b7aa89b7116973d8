"""Dump .explain('formatted') for named queries to plans/<outdir>/<name>_<tag>.txt.

Usage: python scripts/explain_dump.py <sf_dir> <outdir> <tag> <query> [query...]
Queries resolve against the merged gate dicts (same surface bench.py uses).
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from agenticknowledgegraphconstructionsystem_spark.session import get_spark


def main():
    sf_dir, outdir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    spark = get_spark(app_name="explain-dump", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    from agenticknowledgegraphconstructionsystem_spark.gate import KG_QUERIES
    from agenticknowledgegraphconstructionsystem_spark.gate_curation import CURATION_MICRO_QUERIES
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import REL_QUERIES
    from agenticknowledgegraphconstructionsystem_spark.gate_textdata import TEXT_MICRO_QUERIES, TEXT_QUERIES
    merged = {}
    for d in (KG_QUERIES, CURATION_MICRO_QUERIES, REL_QUERIES, TEXT_MICRO_QUERIES, TEXT_QUERIES):
        merged.update(d)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = merged[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
