"""A/B the _ts parallelism floor per query inside ONE JVM: alternate
SPARK_GRAFT_SPREAD=0/1 reps back-to-back so host drift cannot fake a
winner. Usage: python tools/ab_spread.py q1,q2,... [reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocr_processing_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from ocr_processing_pipeline_spark.session import get_spark  # noqa: E402
from tools._warm import warm_materialized  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_spread")
    warm_materialized(spark, sf_dir)

    def run(name):
        t0 = time.time()
        (QUERIES[name].fn(spark, sf_dir)
         .write.mode("overwrite").format("noop").save())
        return round(time.time() - t0, 3)

    out = {}
    for name in names:
        os.environ["SPARK_GRAFT_SPREAD"] = "1"
        run(name)  # warm both paths once
        os.environ["SPARK_GRAFT_SPREAD"] = "0"
        run(name)
        offs, ons = [], []
        for _ in range(reps):
            os.environ["SPARK_GRAFT_SPREAD"] = "0"
            offs.append(run(name))
            os.environ["SPARK_GRAFT_SPREAD"] = "1"
            ons.append(run(name))
        out[name] = {"off": min(offs), "on": min(ons),
                     "off_all": offs, "on_all": ons}
        print(json.dumps({name: out[name]}), flush=True)
        gc.collect()
    print(json.dumps({"verdict": {
        n: ("ON" if v["on"] < v["off"] else "OFF") for n, v in out.items()}}))


if __name__ == "__main__":
    main()
