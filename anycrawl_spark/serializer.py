"""Response serialization (apps/api/src/utils/serializer.ts).

The reference converts DB-layer camelCase records to snake_case API
responses with a recursive key rewrite:

* ``camelToSnake`` (serializer.ts:9-11): every ASCII uppercase letter
  becomes ``_`` + lowercase - including a leading capital (``Foo`` ->
  ``_foo``) and consecutive capitals (``ABConfig`` -> ``_a_b_config``);
  nothing else changes (digits, existing underscores, unicode letters
  untouched).
* ``toSnakeCase`` (serializer.ts:16-52): recurses through objects and
  arrays; ``Date`` values pass through untouched (not applicable to
  JSON-derived inputs); primitives and null/undefined pass through;
  key insertion order is preserved (JS ``for...in``).

The batch surface is row-local (one JSON document in, one out) - an
Arrow-batched ``mapInPandas`` with no shuffle at any scale, the same
shape as every other per-document kernel here.
"""
from __future__ import annotations

import json
import re
from typing import Iterator

from anycrawl_spark.template_handler import js_number_to_string

_UPPER = re.compile(r"[A-Z]")


def camel_to_snake(s: str) -> str:
    """serializer.ts:9-11."""
    return _UPPER.sub(lambda m: "_" + m.group(0).lower(), s)


def to_snake_case(obj):
    """serializer.ts:16-52: recursive key rewrite, values untouched."""
    if isinstance(obj, list):
        return [to_snake_case(x) for x in obj]
    if isinstance(obj, dict):
        return {camel_to_snake(k): to_snake_case(v)
                if isinstance(v, (dict, list)) else v
                for k, v in obj.items()}
    return obj


def _stringify(v) -> str:
    """JSON.stringify parity (insertion order, JS number rendering)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        return js_number_to_string(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(_stringify(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{json.dumps(k, ensure_ascii=False)}:{_stringify(x)}"
            for k, x in v.items()) + "}"
    return "null"


def serialize_records(records, json_col: str = "record_json",
                      id_col: str = "rid"):
    """serializeRecords over a DataFrame of JSON documents: each row's
    camelCase record becomes its snake_case API form (row-local
    mapInPandas, no shuffle)."""
    import pandas as pd  # noqa: F401

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            out = []
            for rid, raw in zip(pdf[id_col], pdf[json_col]):
                try:
                    obj = json.loads(raw) if raw is not None else None
                except ValueError:
                    obj = None
                out.append((rid, _stringify(to_snake_case(obj))
                            if obj is not None else None))
            yield pd.DataFrame(out, columns=[id_col, "response_json"])

    return records.select(id_col, json_col).mapInPandas(
        gen, f"{id_col} long, response_json string")
