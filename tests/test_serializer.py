"""serializer.ts parity: camelCase -> snake_case API responses."""
from __future__ import annotations

import json

from anycrawl_spark.serializer import (camel_to_snake, serialize_records,
                                       to_snake_case)


class TestCamelToSnake:
    def test_basic(self):
        assert camel_to_snake("jobId") == "job_id"
        assert camel_to_snake("creditsUsed") == "credits_used"
        assert camel_to_snake("already_snake") == "already_snake"

    def test_leading_and_consecutive_capitals(self):
        # every [A-Z] independently becomes _lower - no smart acronyms
        assert camel_to_snake("Foo") == "_foo"
        assert camel_to_snake("ABConfig") == "_a_b_config"
        assert camel_to_snake("jobID") == "job_i_d"

    def test_non_ascii_untouched(self):
        assert camel_to_snake("éTat") == "é_tat"
        assert camel_to_snake("k9Value") == "k9_value"


class TestToSnakeCase:
    def test_recursive(self):
        obj = {"jobId": 1, "nestedObj": {"someKey": "v", "deepList":
                                         [{"aB": True}]},
               "plainList": [1, "xY"]}
        out = to_snake_case(obj)
        assert out == {"job_id": 1,
                       "nested_obj": {"some_key": "v",
                                      "deep_list": [{"a_b": True}]},
                       "plain_list": [1, "xY"]}  # values untouched

    def test_primitives_and_null(self):
        assert to_snake_case(None) is None
        assert to_snake_case(5) == 5
        assert to_snake_case("aB") == "aB"

    def test_key_order_preserved(self):
        out = to_snake_case({"zKey": 1, "aKey": 2})
        assert list(out) == ["z_key", "a_key"]


class TestSerializeRecordsOperator:
    def test_batch(self, spark):
        rows = [
            (0, json.dumps({"jobId": 7, "isSuccess": True,
                            "errorMessage": None})),
            (1, json.dumps({"trafficBytes": 123,
                            "jobResults": [{"dataBlob": {"innerKey": 1}}]})),
            (2, "broken json"),
        ]
        df = spark.createDataFrame(rows, "rid long, record_json string")
        got = {r["rid"]: r["response_json"]
               for r in serialize_records(df).collect()}
        assert got[0] == '{"job_id":7,"is_success":true,"error_message":null}'
        assert got[1] == ('{"traffic_bytes":123,"job_results":'
                          '[{"data_blob":{"inner_key":1}}]}')
        assert got[2] is None
