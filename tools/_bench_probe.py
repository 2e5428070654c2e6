"""Ad-hoc single-query bench probe (noop sink, same shape as bench.py)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from spark_extensions_spark.session import get_spark  # noqa: E402
import __spark_entry__ as e  # noqa: E402


def main():
    names = sys.argv[1:] or ["pipeline_release_gate"]
    spark = get_spark(extra_conf={"spark.sql.shuffle.partitions": "8"})
    qs = e.queries()
    sf = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        for i in range(2):
            t0 = time.time()
            try:
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                print(f"TIME {name} run{i}: {time.time()-t0:.2f}s", flush=True)
            except Exception as ex:
                print(f"TIME {name} ERROR {type(ex).__name__}: {str(ex)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()
