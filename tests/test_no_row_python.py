"""North-rule lint (B:15): no per-row Python on the pipeline path — no
row-wise F.udf / @udf, no RDD API in the package."""

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "entity_matching_in_online_retail_spark",
)

BANNED = [
    re.compile(r"\bF\.udf\("),
    re.compile(r"^\s*@udf\b"),
    re.compile(r"\.rdd\b"),
    re.compile(r"\bsparkContext\.parallelize\b"),
]


def test_no_row_python_in_package():
    offenders = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    for pat in BANNED:
                        if pat.search(line):
                            offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
