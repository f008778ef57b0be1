"""Kind model + compiler goldens (reference tests/sql_test.py:12-51,
tests/arrow/model_test.py:6-36)."""

from __future__ import annotations

from pyspark.sql import types as T

from resotodatalink_spark.model.compiler import (
    kind_to_spark_type,
    reported_schema,
    table_schema,
)
from resotodatalink_spark.model.kinds import (
    Kind,
    Model,
    Property,
    get_link_table_name,
    get_table_name,
)
from tests.fixtures import example_model


def test_table_kinds():
    model = example_model()
    # 'resource' is a base kind -> no table (reference sql.py:166-170)
    assert {k.fqn for k in model.table_kinds()} == {"some_instance", "some_volume"}


def test_flattened_columns_order():
    model = example_model()
    props, succs = model.kind_properties(model.kinds["some_instance"], with_id=True)
    assert [p.name for p in props] == [
        "_id",
        "cores",
        "memory",
        "id",
        "name",
        "alias",
        "description",
        "cloud",
        "account",
        "region",
        "zone",
    ]
    assert succs == ["some_volume"]


def test_table_names():
    assert get_table_name("aws.ec2.instance") == "aws_ec2_instance"
    assert get_table_name("foo", with_tmp_prefix=True) == "tmp_foo"
    # 25-char truncation per side (reference schema_utils.py:33-36)
    long = "a" * 40
    name = get_link_table_name(long, "b")
    assert name == f"link_{'a'*25}_b"


def test_scalar_mappings():
    model = example_model()
    assert kind_to_spark_type(model, "int32") == T.IntegerType()
    assert kind_to_spark_type(model, "int64") == T.LongType()
    # reference bug (type_converter.py:16-17) fixed: float is FloatType
    assert kind_to_spark_type(model, "float") == T.FloatType()
    assert kind_to_spark_type(model, "double") == T.DoubleType()
    assert kind_to_spark_type(model, "string[]") == T.ArrayType(T.StringType())
    assert kind_to_spark_type(model, "dictionary[string, int64]") == T.MapType(
        T.StringType(), T.LongType()
    )
    assert kind_to_spark_type(model, "any") == T.StringType()
    assert kind_to_spark_type(model, "dict_blob") == T.StringType()


def test_enum_and_complex_kinds():
    model = example_model()
    model.kinds["color"] = Kind("color", runtime_kind="string")
    model.kinds["point"] = Kind(
        "point", properties=[Property("x", "double"), Property("y", "double")]
    )
    assert kind_to_spark_type(model, "color") == T.StringType()
    assert kind_to_spark_type(model, "point") == T.StructType(
        [
            T.StructField("x", T.DoubleType(), True),
            T.StructField("y", T.DoubleType(), True),
        ]
    )
    import pytest

    with pytest.raises(ValueError):
        kind_to_spark_type(model, "no_such_kind")


def test_table_schema_shape():
    model = example_model()
    schema = table_schema(model, model.kinds["some_volume"])
    assert schema.fieldNames() == [
        "_id",
        "capacity",
        "id",
        "name",
        "alias",
        "description",
        "cloud",
        "account",
        "region",
        "zone",
    ]
    assert schema["capacity"].dataType == T.IntegerType()
    r = reported_schema(model, model.kinds["some_volume"])
    assert "cloud" not in r.fieldNames() and "_id" not in r.fieldNames()
