"""Serialized-plan ingestion (SURVEY.md §2a#20 — the JNI/protobuf path's
TPU-native equivalent): JSON plan -> TreeExprBuilder round-trips, and an
external planner can compile + evaluate without importing node classes."""
import json

import numpy as np
import pyarrow as pa
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.plan import (PlanError, dump_plan, load_plan, parse_node,
                              make_filter_from_plan, make_projector_from_plan)

B = g.TreeExprBuilder


def _schema_doc():
    return [{"name": "a", "type": "int64"},
            {"name": "b", "type": "float64"},
            {"name": "c", "type": "bool"}]


def test_load_and_evaluate_projector():
    doc = {
        "schema": _schema_doc(),
        "expressions": [{
            "root": {"function": {
                "name": "add",
                "args": [
                    {"function": {"name": "multiply",
                                  "args": [{"field": "b"},
                                           {"literal": {"type": "float64",
                                                        "value": 2.0}}],
                                  "return_type": "float64"}},
                    {"function": {"name": "castFLOAT8",
                                  "args": [{"field": "a"}],
                                  "return_type": "float64"}}],
                "return_type": "float64"}},
            "result": {"name": "out", "type": "float64"}}],
    }
    proj = make_projector_from_plan(json.dumps(doc))
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, None], type=pa.int64()),
         pa.array([0.5, 1.5, 2.5]),
         pa.array([True, False, True])], names=["a", "b", "c"])
    (out,) = proj.evaluate(batch)
    arr = out.to_arrow() if hasattr(out, "to_arrow") else out
    assert arr.to_pylist() == [2.0, 5.0, None]


def test_load_and_evaluate_filter():
    doc = {
        "schema": _schema_doc(),
        "condition": {"root": {"and": [
            {"function": {"name": "greater_than",
                          "args": [{"field": "a"},
                                   {"literal": {"type": "int64",
                                                "value": 1}}],
                          "return_type": "bool"}},
            {"field": "c"}]}},
    }
    filt = make_filter_from_plan(doc)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([0, 2, 3, 5], type=pa.int64()),
         pa.array([0.0, 1.0, 2.0, 3.0]),
         pa.array([True, True, False, True])], names=["a", "b", "c"])
    sel = filt.evaluate(batch)
    assert sel.to_numpy().tolist() == [1, 3]


def test_round_trip_to_string():
    """dump_plan(load_plan(doc)) reproduces the tree: pinned via the
    reference to_string grammar (test_gandiva.py:377-393 analogue)."""
    schema = dt.Schema([dt.Field("x", dt.int64), dt.Field("s", dt.string)])
    root = B.make_if(
        B.make_function("greater_than",
                        [B.make_field(schema.field("x")),
                         B.make_int64_literal(2)], dt.bool_),
        B.make_field(schema.field("x")),
        B.make_function("negative", [B.make_field(schema.field("x"))],
                        dt.int64),
        dt.int64)
    expr = B.make_expression(root, dt.Field("out", dt.int64))
    cond = B.make_condition(
        B.make_or([B.make_in_expression_string(
            B.make_field(schema.field("s")), {"a", "b"}),
            B.make_in_expression_int64(
                B.make_field(schema.field("x")), {1, 2, 3})]))
    doc = dump_plan(schema, [expr], cond)
    doc = json.loads(json.dumps(doc))  # ensure pure-JSON serializable
    plan = load_plan(doc)
    assert plan.expressions[0].to_string() == expr.to_string()
    assert plan.condition.to_string() == cond.to_string()
    assert plan.schema == schema
    # and the round-tripped plan dumps back to the identical document
    assert dump_plan(plan.schema, plan.expressions, plan.condition) == doc


def test_decimal_and_binary_literals_round_trip():
    schema = dt.Schema([dt.Field("p", dt.binary)])
    root = B.make_function(
        "equal", [B.make_field(schema.field("p")),
                  B.make_binary_literal(b"\x01\xff")], dt.bool_)
    cond = B.make_condition(root)
    doc = dump_plan(schema, [], cond)
    assert doc["condition"]["root"]["function"]["args"][1][
        "literal"]["value"] == "01ff"
    plan = load_plan(doc)
    assert plan.condition.to_string() == cond.to_string()

    dec = B.make_decimal_literal("123.45", 10, 2)
    doc2 = dump_plan(dt.Schema([]), [B.make_expression(
        dec, dt.Field("d", dt.decimal128(10, 2)))])
    plan2 = load_plan(doc2)
    assert plan2.expressions[0].to_string() == \
        B.make_expression(dec, dt.Field("d", dt.decimal128(10, 2))).to_string()


def test_plan_errors():
    with pytest.raises(PlanError, match="invalid JSON"):
        load_plan("{nope")
    with pytest.raises(PlanError, match="'schema'"):
        load_plan({"expressions": []})
    with pytest.raises(PlanError, match="not in plan schema"):
        load_plan({"schema": _schema_doc(),
                   "condition": {"root": {"field": "zz"}}})
    with pytest.raises(PlanError, match="unknown node kind"):
        parse_node({"frobnicate": {}}, dt.Schema([]))
    with pytest.raises(PlanError, match="no condition"):
        make_filter_from_plan({"schema": _schema_doc()})
    with pytest.raises(PlanError, match="no expressions"):
        make_projector_from_plan({"schema": _schema_doc()})
