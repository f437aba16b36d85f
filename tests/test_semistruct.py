"""JSON key census (operators/semistruct.py): counts, invalid bucket,
nested keys stay top-level."""

from osm_hadoop_spark.operators.semistruct import INVALID_KEY, json_key_census


def test_census_and_invalid(spark):
    rows = [
        ('{"a": 1, "b": 2}',),
        ('{"a": 5}',),
        ('{"b": {"c": 9}}',),   # nested: only b is top-level
        ("not json",),
        (None,),
        ("{}",),                 # valid, zero keys: contributes nothing
    ]
    df = spark.createDataFrame(rows, "j string")
    got = {r.key: r.n_docs for r in json_key_census(df, "j").collect()}
    assert got == {"a": 2, "b": 2, INVALID_KEY: 2}
