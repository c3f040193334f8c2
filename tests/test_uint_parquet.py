"""Unsigned-int parquet mapping (SURVEY §7.4.2).

Spark has no unsigned types; the reference's ScalarValue::UInt* variants
(qurious/src/datatypes/scalar.rs:85-107) must land on the up-range mapping
uint8/16 -> Short/Int, uint32 -> Long, uint64 -> Decimal(20,0) with values
across the full range preserved.
"""

from decimal import Decimal

from qurious_spark.queries.sources import write_uint_fixture
from qurious_spark.sources.readers import read_parquet


def test_uint_mapping_and_values(spark, tmp_path):
    path = write_uint_fixture(str(tmp_path / "u.parquet"))
    df = read_parquet(spark, path)
    assert dict(df.dtypes) == {
        "u8": "smallint",
        "u16": "int",
        "u32": "bigint",
        "u64": "decimal(20,0)",
    }
    top = df.orderBy("u8", ascending=False).first()
    assert top.u8 == 255
    assert top.u16 == 65535
    assert top.u32 == 4294967295
    assert top.u64 == Decimal(2**64 - 1)
