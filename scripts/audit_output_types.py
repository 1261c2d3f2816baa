"""Audit registry output schemas for driver-canonicalization hazards.

The driver's correctness gate canonicalizes both result frames with a pandas
``sort_values`` over every column; array/map/struct cells arrive as
numpy.ndarray / dict / Row — all unhashable — and abort the compare
(see CORRECTNESS_r02.json: m01, u01).  This script builds every registry
entry's DataFrame (plan only where possible) and reports any output column
whose type is not atomic.
"""

from __future__ import annotations

import os
import sys
import traceback

from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.session import get_spark  # noqa: E402
import spj_query_engine_spark.workload  # noqa: E402,F401  (registers entries)
from spj_query_engine_spark.workload.registry import REGISTRY  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    only = set(sys.argv[1:])
    spark = get_spark()
    bad: list[str] = []
    for name, wq in REGISTRY.items():
        if only and not any(s in name for s in only):
            continue
        try:
            df = wq.fn(spark, sf_dir)
            hazards = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            binaries = [
                f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)
            ]
            if hazards:
                bad.append(name)
                print(f"HAZARD {name}: {hazards}")
            elif binaries:
                print(f"binary {name}: {binaries} (bytes are hashable; likely ok)")
        except Exception:
            print(f"ERROR building {name}:")
            traceback.print_exc()
            bad.append(name)
    print(f"\n{len(bad)} hazardous entries: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
