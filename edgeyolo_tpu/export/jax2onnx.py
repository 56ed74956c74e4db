"""jaxpr -> ONNX converter: trace a jitted function and emit ModelProto bytes.

Behavioral spec: ultralytics/engine/exporter.py:487-540 (export_onnx) — the
reference bridges through torch.onnx.export; here the bridge is a direct
jaxpr walk. Each lax primitive in the traced inference program maps to one
(or a short chain of) standard ONNX ops at opset 17; NHWC convolutions are
wrapped with Transposes to ONNX's NCHW Conv (onnxruntime's layout optimizer
collapses the back-to-back pairs at load time). Constant sub-graphs (iota,
anchor grids, strides) are partially evaluated at export time and stored as
initializers, so the emitted graph contains only data-dependent ops.

Serialization itself is in onnx_proto.py (no onnx package needed); the
round-trip executor used by AutoBackend/tests is export/onnx_runtime.py.
"""

from __future__ import annotations

import numpy as np

from edgeyolo_tpu.export import onnx_proto as P

_CALL_PRIMS = {
    "jit", "pjit", "closed_call", "core_call", "custom_jvp_call",
    "custom_vjp_call", "custom_vjp_call_jaxpr", "remat", "checkpoint",
}

_INT64_MIN = -(1 << 62)  # Slice sentinel for reverse slicing (spec clamps)


class _Val:
    """A traced value: either a graph tensor (name) or an export-time
    constant (np array, materialized as an initializer only when consumed
    by a graph op)."""

    __slots__ = ("name", "const", "shape", "dtype")

    def __init__(self, name=None, const=None, shape=None, dtype=None):
        if const is not None:
            const = np.asarray(const)
            shape, dtype = const.shape, const.dtype
        self.name, self.const = name, const
        self.shape, self.dtype = tuple(shape), np.dtype(dtype)

    @property
    def is_const(self):
        return self.const is not None


class _Ctx:
    def __init__(self):
        self.nodes: list[bytes] = []
        self.inits: list[bytes] = []
        self._init_cache: dict[tuple, str] = {}
        self._n = 0

    def fresh(self, hint="t"):
        self._n += 1
        return f"{hint}_{self._n}"

    def node(self, op, inputs, n_out=1, hint=None, **attrs):
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append(P.node_proto(op, inputs, outs, **attrs))
        return outs if n_out != 1 else outs[0]

    def init(self, arr, hint="c"):
        import hashlib

        arr = np.ascontiguousarray(arr)
        # content-keyed dedup (id() is unsafe: freed temporaries recycle ids)
        key = (hashlib.blake2b(arr.tobytes(), digest_size=16).digest(),
               arr.shape, str(arr.dtype))
        if key in self._init_cache:
            return self._init_cache[key]
        name = self.fresh(hint)
        self.inits.append(P.tensor_proto(name, arr))
        self._init_cache[key] = name
        return name

    def inp(self, v: _Val):
        """Graph-tensor name for a value, materializing constants."""
        if v.is_const:
            return self.init(v.const)
        return v.name

    def i64(self, seq, hint="shape"):
        return self.init(np.asarray(seq, np.int64), hint)


def _np(x):
    return np.asarray(x)


# ------------------------------------------------------------- handlers ---
# each: h(ctx, eqn, ins: list[_Val]) -> list[str] (output tensor names)

_H = {}


def _reg(*names):
    def deco(fn):
        for n in names:
            _H[n] = fn
        return fn

    return deco


_UNARY = {
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "sin": "Sin", "cos": "Cos",
    "tan": "Tan", "atan": "Atan", "asin": "Asin", "acos": "Acos",
    "abs": "Abs", "neg": "Neg", "floor": "Floor", "ceil": "Ceil",
    "round": "Round", "sign": "Sign", "sqrt": "Sqrt", "erf": "Erf",
    "logistic": "Sigmoid", "not": "Not", "is_finite": "IsInf",  # see below
}
_BINARY = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div", "max": "Max",
    "min": "Min", "pow": "Pow", "rem": "Mod", "and": "And", "or": "Or",
    "xor": "Xor", "eq": "Equal", "lt": "Less", "le": "LessOrEqual",
    "gt": "Greater", "ge": "GreaterOrEqual", "atan2": "Atan2",
}


def _h_unary(ctx, eqn, ins):
    name = eqn.primitive.name
    if name == "is_finite":  # Not(Or(IsNaN, IsInf))
        x = ctx.inp(ins[0])
        bad = ctx.node("Or", [ctx.node("IsNaN", [x]), ctx.node("IsInf", [x])])
        return [ctx.node("Not", [bad])]
    return [ctx.node(_UNARY[name], [ctx.inp(ins[0])])]


def _h_binary(ctx, eqn, ins):
    name = eqn.primitive.name
    op = _BINARY[name]
    a, b = ctx.inp(ins[0]), ctx.inp(ins[1])
    if name == "rem":  # lax.rem is C-style fmod
        return [ctx.node("Mod", [a, b], fmod=1)]
    if name in ("and", "or", "xor") and ins[0].dtype != np.bool_:
        # lax and/or/xor are BITWISE on integer dtypes; ONNX And/Or/Xor are
        # boolean-only and would silently change semantics
        raise NotImplementedError(
            f"onnx: bitwise lax.{name} on {ins[0].dtype} (bool only)")
    return [ctx.node(op, [a, b])]


for _n in _UNARY:
    _H[_n] = _h_unary
for _n in _BINARY:
    _H[_n] = _h_binary


@_reg("integer_pow")
def _h_ipow(ctx, eqn, ins):
    y = np.asarray(eqn.params["y"], ins[0].dtype)
    return [ctx.node("Pow", [ctx.inp(ins[0]), ctx.init(y, "exponent")])]


@_reg("rsqrt")
def _h_rsqrt(ctx, eqn, ins):
    return [ctx.node("Reciprocal", [ctx.node("Sqrt", [ctx.inp(ins[0])])])]


@_reg("log1p")
def _h_log1p(ctx, eqn, ins):
    one = ctx.init(np.asarray(1, ins[0].dtype), "one")
    return [ctx.node("Log", [ctx.node("Add", [ctx.inp(ins[0]), one])])]


@_reg("expm1")
def _h_expm1(ctx, eqn, ins):
    one = ctx.init(np.asarray(1, ins[0].dtype), "one")
    return [ctx.node("Sub", [ctx.node("Exp", [ctx.inp(ins[0])]), one])]


@_reg("square")
def _h_square(ctx, eqn, ins):
    x = ctx.inp(ins[0])
    return [ctx.node("Mul", [x, x])]


@_reg("stop_gradient", "copy")
def _h_identity(ctx, eqn, ins):
    return [ctx.node("Identity", [ctx.inp(ins[0])])]


@_reg("convert_element_type")
def _h_cast(ctx, eqn, ins):
    to = P.DTYPE_CODE[np.dtype(eqn.params["new_dtype"])]
    return [ctx.node("Cast", [ctx.inp(ins[0])], to=to)]


@_reg("select_n")
def _h_select(ctx, eqn, ins):
    if len(ins) != 3:
        raise NotImplementedError("onnx: select_n with >2 cases")
    which, f, t = ins  # cases[0] when False, cases[1] when True
    return [ctx.node("Where", [ctx.inp(which), ctx.inp(t), ctx.inp(f)])]


@_reg("clamp")
def _h_clamp(ctx, eqn, ins):
    lo, x, hi = ins  # compose (bounds may be non-scalar; Clip requires scalar)
    y = ctx.node("Max", [ctx.inp(x), ctx.inp(lo)])
    return [ctx.node("Min", [y, ctx.inp(hi)])]


@_reg("reshape")
def _h_reshape(ctx, eqn, ins):
    if eqn.params.get("dimensions") is not None:
        perm = list(eqn.params["dimensions"])
        x = ctx.node("Transpose", [ctx.inp(ins[0])], perm=perm)
    else:
        x = ctx.inp(ins[0])
    shape = ctx.i64(eqn.params["new_sizes"])
    return [ctx.node("Reshape", [x, shape])]


@_reg("squeeze")
def _h_squeeze(ctx, eqn, ins):
    out_shape = [d for i, d in enumerate(ins[0].shape)
                 if i not in set(eqn.params["dimensions"])]
    return [ctx.node("Reshape", [ctx.inp(ins[0]), ctx.i64(out_shape)])]


@_reg("expand_dims")
def _h_expand_dims(ctx, eqn, ins):
    rank = len(ins[0].shape) + len(eqn.params["dimensions"])
    dims = {d % rank for d in eqn.params["dimensions"]}
    it = iter(ins[0].shape)
    out_shape = [1 if i in dims else next(it) for i in range(rank)]
    return [ctx.node("Reshape", [ctx.inp(ins[0]), ctx.i64(out_shape)])]


@_reg("broadcast_in_dim")
def _h_broadcast(ctx, eqn, ins):
    shape = list(eqn.params["shape"])
    bdims = list(eqn.params["broadcast_dimensions"])
    inter = [1] * len(shape)
    for i, d in enumerate(bdims):
        inter[d] = ins[0].shape[i]
    x = ctx.inp(ins[0])
    if tuple(inter) != ins[0].shape:
        x = ctx.node("Reshape", [x, ctx.i64(inter)])
    if inter != shape:
        x = ctx.node("Expand", [x, ctx.i64(shape)])
    return [x]


@_reg("transpose")
def _h_transpose(ctx, eqn, ins):
    return [ctx.node("Transpose", [ctx.inp(ins[0])],
                     perm=list(eqn.params["permutation"]))]


@_reg("concatenate")
def _h_concat(ctx, eqn, ins):
    return [ctx.node("Concat", [ctx.inp(v) for v in ins],
                     axis=int(eqn.params["dimension"]))]


@_reg("split")
def _h_split(ctx, eqn, ins):
    sizes = [int(s) for s in eqn.params["sizes"]]
    outs = ctx.node("Split", [ctx.inp(ins[0]), ctx.i64(sizes, "split")],
                    n_out=len(sizes), axis=int(eqn.params["axis"]))
    return outs if isinstance(outs, list) else [outs]


@_reg("slice")
def _h_slice(ctx, eqn, ins):
    starts = [int(s) for s in eqn.params["start_indices"]]
    ends = [int(e) for e in eqn.params["limit_indices"]]
    strides = eqn.params.get("strides") or [1] * len(starts)
    return [ctx.node("Slice", [ctx.inp(ins[0]), ctx.i64(starts, "starts"),
                               ctx.i64(ends, "ends"),
                               ctx.i64(range(len(starts)), "axes"),
                               ctx.i64([int(s) for s in strides], "steps")])]


@_reg("rev")
def _h_rev(ctx, eqn, ins):
    axes = [int(a) for a in eqn.params["dimensions"]]
    n = len(axes)
    return [ctx.node("Slice", [ctx.inp(ins[0]), ctx.i64([-1] * n, "starts"),
                               ctx.i64([_INT64_MIN] * n, "ends"),
                               ctx.i64(axes, "axes"),
                               ctx.i64([-1] * n, "steps")])]


@_reg("pad")
def _h_pad(ctx, eqn, ins):
    cfg = eqn.params["padding_config"]
    if any(int(i) != 0 for _, _, i in cfg):
        raise NotImplementedError("onnx: interior (dilated) lax.pad")
    x = ctx.inp(ins[0])
    lo = [int(l) for l, _, _ in cfg]
    hi = [int(h) for _, h, _ in cfg]
    # negative amounts crop: route through Slice first
    if any(v < 0 for v in lo + hi):
        starts = [max(0, -l) for l in lo]
        ends = [d + min(0, h) for d, h in zip(ins[0].shape, hi)]
        x = ctx.node("Slice", [x, ctx.i64(starts, "starts"),
                               ctx.i64(ends, "ends"),
                               ctx.i64(range(len(lo)), "axes")])
        lo = [max(0, l) for l in lo]
        hi = [max(0, h) for h in hi]
    if not any(lo + hi):
        return [x]
    cval = ins[1]
    cv = (ctx.inp(cval) if not cval.is_const
          else ctx.init(np.asarray(cval.const).reshape(()), "pad_value"))
    return [ctx.node("Pad", [x, ctx.i64(lo + hi, "pads"), cv], mode="constant")]


def _zero_insert(ctx, x_name, shape, lhs_dilation, dtype):
    """Insert (d-1) zeros between elements along dilated axes (the lax
    conv lhs_dilation semantics) via Reshape -> Pad -> Reshape -> Slice."""
    cur = list(shape)
    for ax, d in enumerate(lhs_dilation):
        d = int(d)
        if d == 1:
            continue
        inter = cur[:ax + 1] + [1] + cur[ax + 1:]
        x_name = ctx.node("Reshape", [x_name, ctx.i64(inter)])
        pads = [0] * len(inter) * 2
        pads[len(inter) + ax + 1] = d - 1  # hi-pad the inserted unit dim
        zero = ctx.init(np.zeros((), dtype), "zero")
        x_name = ctx.node("Pad", [x_name, ctx.i64(pads, "pads"), zero],
                          mode="constant")
        cur[ax] = cur[ax] * d
        x_name = ctx.node("Reshape", [x_name, ctx.i64(cur)])
        # trailing (d-1) zeros are not part of the dilated signal
        x_name = ctx.node("Slice", [x_name, ctx.i64([0], "starts"),
                                    ctx.i64([cur[ax] - (d - 1)], "ends"),
                                    ctx.i64([ax], "axes")])
        cur[ax] -= d - 1
    return x_name, cur


@_reg("conv_general_dilated")
def _h_conv(ctx, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    if int(p.get("batch_group_count", 1)) != 1:
        raise NotImplementedError("onnx: batch_group_count != 1")
    nsp = len(lhs_spec) - 2
    strides = [int(s) for s in p["window_strides"]]
    padding = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    rhs_dil = [int(d) for d in p.get("rhs_dilation") or [1] * nsp]
    lhs_dil = [int(d) for d in p.get("lhs_dilation") or [1] * nsp]
    groups = int(p.get("feature_group_count", 1))

    # input -> NCHW
    perm_in = [lhs_spec[0], lhs_spec[1], *lhs_spec[2:]]
    x = ctx.inp(ins[0])
    if perm_in != list(range(len(perm_in))):
        x = ctx.node("Transpose", [x], perm=perm_in)
    x_shape = [ins[0].shape[i] for i in perm_in]

    # transposed-conv inputs (lhs_dilation>1): zero-insert explicitly, then
    # an ordinary Conv reproduces lax's dilated-input correlation exactly
    if any(d != 1 for d in lhs_dil):
        x, x_shape = _zero_insert(ctx, x, x_shape, [1, 1, *lhs_dil], ins[0].dtype)

    # kernel -> OIHW
    perm_k = [rhs_spec[0], rhs_spec[1], *rhs_spec[2:]]
    kv = ins[1]
    if kv.is_const:
        w = ctx.init(np.transpose(kv.const, perm_k), "weight")
    else:
        w = ctx.node("Transpose", [ctx.inp(kv)], perm=perm_k)

    # negative lax conv padding crops the input (reachable via some
    # conv_transpose configs); ONNX Conv pads must be >=0 -> Slice crop first
    if any(lo < 0 or hi < 0 for lo, hi in padding):
        starts = [max(0, -lo) for lo, _ in padding]
        ends = [d + min(0, hi) for d, (_, hi) in zip(x_shape[2:], padding)]
        x = ctx.node("Slice", [x, ctx.i64(starts, "starts"),
                               ctx.i64(ends, "ends"),
                               ctx.i64(range(2, 2 + nsp), "axes")])
        padding = [(max(0, lo), max(0, hi)) for lo, hi in padding]
    pads = [lo for lo, _ in padding] + [hi for _, hi in padding]
    y = ctx.node("Conv", [x, w], strides=strides, pads=pads,
                 dilations=rhs_dil, group=groups)
    # NCHW -> out_spec order
    perm_out = [out_spec[0], out_spec[1], *out_spec[2:]]
    inv = np.argsort(perm_out).tolist()
    if inv != list(range(len(inv))):
        y = ctx.node("Transpose", [y], perm=inv)
    return [y]


@_reg("reduce_window_max")
def _h_maxpool(ctx, eqn, ins):
    p = eqn.params
    win = [int(w) for w in p["window_dimensions"]]
    strides = [int(s) for s in p["window_strides"]]
    pads = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    if any(int(d) != 1 for d in p.get("base_dilation") or []) or \
       any(int(d) != 1 for d in p.get("window_dilation") or []):
        raise NotImplementedError("onnx: dilated reduce_window")
    rank = len(win)
    spatial = [i for i in range(rank) if win[i] != 1 or strides[i] != 1
               or pads[i] != (0, 0)]
    chan = [i for i in range(rank) if i not in spatial and i != 0]
    if 0 in spatial or not spatial:
        raise NotImplementedError("onnx: reduce_window over batch dim")
    # NHWC (or any layout) -> N, C..., spatial...
    perm = [0, *chan, *spatial]
    x = ctx.node("Transpose", [ctx.inp(ins[0])], perm=perm) \
        if perm != list(range(rank)) else ctx.inp(ins[0])
    y = ctx.node("MaxPool", [x],
                 kernel_shape=[win[i] for i in spatial],
                 strides=[strides[i] for i in spatial],
                 pads=[pads[i][0] for i in spatial] + [pads[i][1] for i in spatial])
    inv = np.argsort(perm).tolist()
    if inv != list(range(rank)):
        y = ctx.node("Transpose", [y], perm=inv)
    return [y]


@_reg("dot_general")
def _h_dot(ctx, eqn, ins):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = ins
    lf = [i for i in range(len(lhs.shape)) if i not in set(lc) | set(lb)]
    rf = [i for i in range(len(rhs.shape)) if i not in set(rc) | set(rb)]
    B = int(np.prod([lhs.shape[i] for i in lb], initial=1))
    M = int(np.prod([lhs.shape[i] for i in lf], initial=1))
    K = int(np.prod([lhs.shape[i] for i in lc], initial=1))
    N = int(np.prod([rhs.shape[i] for i in rf], initial=1))

    def prep(v, perm, new_shape):
        x = ctx.inp(v)
        if perm != list(range(len(v.shape))):
            x = ctx.node("Transpose", [x], perm=perm)
        return ctx.node("Reshape", [x, ctx.i64(new_shape)])

    a = prep(lhs, [*lb, *lf, *lc], [B, M, K] if lb else [M, K])
    b = prep(rhs, [*rb, *rc, *rf], [B, K, N] if rb else [K, N])
    y = ctx.node("MatMul", [a, b])
    out_shape = ([lhs.shape[i] for i in lb] + [lhs.shape[i] for i in lf]
                 + [rhs.shape[i] for i in rf])
    return [ctx.node("Reshape", [y, ctx.i64(out_shape)])]


def _h_reduce(op, axes_as_input):
    def h(ctx, eqn, ins):
        axes = [int(a) for a in eqn.params["axes"]]
        if axes_as_input:  # ReduceSum/ReduceProd take axes as input at opset 13+
            return [ctx.node(op, [ctx.inp(ins[0]), ctx.i64(axes, "axes")],
                             keepdims=0)]
        return [ctx.node(op, [ctx.inp(ins[0])], axes=axes, keepdims=0)]

    return h


_H["reduce_sum"] = _h_reduce("ReduceSum", True)
_H["reduce_max"] = _h_reduce("ReduceMax", False)
_H["reduce_min"] = _h_reduce("ReduceMin", False)
_H["reduce_prod"] = _h_reduce("ReduceProd", False)


@_reg("reduce_and", "reduce_or")
def _h_reduce_bool(ctx, eqn, ins):
    # no boolean reduce in ONNX: cast to int32, reduce, compare
    axes = [int(a) for a in eqn.params["axes"]]
    x = ctx.node("Cast", [ctx.inp(ins[0])], to=P.DTYPE_CODE[np.dtype(np.int32)])
    if eqn.primitive.name == "reduce_and":
        y = ctx.node("ReduceMin", [x], axes=axes, keepdims=0)
    else:
        y = ctx.node("ReduceMax", [x], axes=axes, keepdims=0)
    zero = ctx.init(np.asarray(0, np.int32), "zero")
    return [ctx.node("Greater", [y, zero])]


@_reg("argmax", "argmin")
def _h_arg(ctx, eqn, ins):
    (axis,) = eqn.params["axes"]
    op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    y = ctx.node(op, [ctx.inp(ins[0])], axis=int(axis), keepdims=0)
    idt = np.dtype(eqn.params["index_dtype"])
    if idt != np.int64:
        y = ctx.node("Cast", [y], to=P.DTYPE_CODE[idt])
    return [y]


@_reg("cumsum")
def _h_cumsum(ctx, eqn, ins):
    ax = ctx.init(np.asarray(int(eqn.params["axis"]), np.int64), "axis")
    return [ctx.node("CumSum", [ctx.inp(ins[0]), ax],
                     reverse=int(bool(eqn.params.get("reverse"))))]


# ------------------------------------------------------------ converter ---


def _sub_jaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in eqn.params:
            cj = eqn.params[key]
            if hasattr(cj, "jaxpr"):  # ClosedJaxpr
                return cj.jaxpr, list(cj.consts)
            return cj, []
    raise NotImplementedError(f"onnx: call primitive {eqn.primitive.name} "
                              f"without a jaxpr param")


def _try_fold(eqn, ins):
    """Partially evaluate an eqn whose inputs are all export-time constants."""
    outs = eqn.primitive.bind(*[v.const for v in ins], **eqn.params)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return [np.asarray(o) for o in outs]


def _walk(ctx, jaxpr, env):
    def read(var):
        from jax._src.core import Literal

        if isinstance(var, Literal):
            return _Val(const=np.asarray(var.val, var.aval.dtype))
        return env[var]

    for eqn in jaxpr.eqns:
        ins = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in _CALL_PRIMS:
            sub, consts = _sub_jaxpr(eqn)
            sub_env = dict(zip(sub.constvars, [_Val(const=_np(c)) for c in consts]))
            # custom_* calls pass consts as leading invars; jaxpr invars count
            # tells how many of the eqn's trailing inputs it consumes
            sub_env.update(zip(sub.invars, ins[len(ins) - len(sub.invars):]))
            _walk(ctx, sub, sub_env)
            from jax._src.core import Literal as _L

            for ov, sv in zip(eqn.outvars, sub.outvars):
                env[ov] = (_Val(const=np.asarray(sv.val, sv.aval.dtype))
                           if isinstance(sv, _L) else sub_env[sv])
            continue
        if all(v.is_const for v in ins):
            try:
                outs = _try_fold(eqn, ins)
                for ov, arr in zip(eqn.outvars, outs):
                    env[ov] = _Val(const=arr)
                continue
            except Exception:
                pass  # fall through to graph emission
        if name not in _H:
            raise NotImplementedError(
                f"onnx: no converter for lax primitive '{name}' "
                f"(shapes {[v.shape for v in ins]})")
        out_names = _H[name](ctx, eqn, ins)
        for ov, nm in zip(eqn.outvars, out_names):
            env[ov] = _Val(name=nm, shape=ov.aval.shape, dtype=ov.aval.dtype)


def export_onnx_bytes(fn, *example_args, input_names=None,
                      output_prefix="output", graph_name="edgeyolo_tpu",
                      doc="", metadata=None) -> bytes:
    """Trace `fn(*example_args)` and return ONNX ModelProto bytes (opset 17).

    Output tensors are named `{output_prefix}0..N` over the flattened pytree
    of fn's return value. Static shapes (the traced example's), like the
    reference's non-dynamic torch.onnx.export path.
    """
    import jax

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    flat_in = jax.tree_util.tree_leaves(example_args)
    if input_names is None:
        input_names = [f"images{i}" if i else "images"
                       for i in range(len(flat_in))]
    assert len(flat_in) == len(jaxpr.invars), "pytree inputs flattened mismatch"

    ctx = _Ctx()
    env = {}
    for cv, c in zip(jaxpr.constvars, closed.consts):
        env[cv] = _Val(const=_np(c))
    g_inputs = []
    for var, arr, nm in zip(jaxpr.invars, flat_in, input_names):
        env[var] = _Val(name=nm, shape=var.aval.shape, dtype=var.aval.dtype)
        g_inputs.append(P.value_info_proto(nm, np.dtype(var.aval.dtype),
                                           var.aval.shape))

    _walk(ctx, jaxpr, env)

    from jax._src.core import Literal

    g_outputs, out_infos = [], []
    for i, ov in enumerate(jaxpr.outvars):
        nm = f"{output_prefix}{i}"
        v = (_Val(const=np.asarray(ov.val, ov.aval.dtype))
             if isinstance(ov, Literal) else env[ov])
        src = ctx.inp(v)
        ctx.nodes.append(P.node_proto("Identity", [src], [nm]))
        out_infos.append(P.value_info_proto(nm, v.dtype, v.shape))
        g_outputs.append(nm)

    graph = P.graph_proto(ctx.nodes, graph_name, ctx.inits, g_inputs, out_infos)
    return P.model_proto(graph, opset=17, doc=doc, metadata=metadata)
