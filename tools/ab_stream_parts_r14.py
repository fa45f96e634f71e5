"""Interleaved A/B (r14): stream gate state partitions — session width
(old) vs keyed-state-volume rule (new). Alternates variants in ONE
session, min-of-N each, host phase cancels to first order."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from faust_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.1"
KEYS = ["stream_tumbling_hourly", "stream_session_windows",
        "stream_stateful_counter"]
N = 3

spark = get_spark("ab_stream_parts")
qs = entry.queries()
qs["q6_forecast"](spark, SF).collect()
spark.range(32).mapInPandas(lambda it: it, "id long").collect()

rule = entry._stream_state_parts


def old_rule(s, d):  # the pre-r14 behavior: session width
    return s.conf.get("spark.sql.shuffle.partitions")


res = {}
for key in KEYS:
    a = b = None
    for i in range(N):
        for variant in ("new", "old"):
            entry._stream_state_parts = rule if variant == "new" else old_rule
            t0 = time.time()
            qs[key](spark, SF).collect()
            el = time.time() - t0
            if variant == "new":
                a = el if a is None or el < a else a
            else:
                b = el if b is None or el < b else b
    entry._stream_state_parts = rule
    res[key] = {"new_min": round(a, 3), "old_min": round(b, 3),
                "ratio": round(a / b, 3)}
    print(key, res[key], flush=True)

with open("artifacts/ab_stream_parts_r14.json", "w") as f:
    json.dump({"sf": SF, "repeats": N, "results": res}, f, indent=1)
