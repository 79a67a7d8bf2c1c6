"""ONNX -> native-Flax weight transplanter with per-layer verification.

The reference runs published ``.onnx`` checkpoints through ONNXRuntime
(reference: BDRC/inference.py:128,294). This framework executes them
through its own graph executor (onnx/runner.py); this module adds the
second, independent path: importing the checkpoint's WEIGHTS into the
corresponding native Flax module so the same parameters run through both
implementations — per-layer numeric diffs between the two then
cross-validate executor and module against each other
(SURVEY §7 "hard parts": ONNX->Flax weight fidelity).

Matching strategy: weighted ops are taken from the graph in node order
(exporters emit topologically, tracing the forward) and aligned with the
Flax module's weighted layers in EXECUTION order (recorded through
``nn.intercept_methods``). Exporter idioms handled:

- Conv kernels OIHW/OIW -> Flax HWIO/WIO transposes;
- BatchNorm folded into Conv bias (torch eval-mode export): the Flax
  BatchNorm collapses to an exact identity-with-bias (mean 0, var
  1 - eps so the denominator is exactly 1, scale 1, bias = folded bias);
- standalone BatchNormalization nodes: variance shifted by
  (eps_onnx - eps_flax) so both normalizations are bit-equivalent;
- Gemm transB / MatMul+Add pairs -> Dense kernels (out,in) -> (in,out).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from ocr_inference_tpu.onnx import wire


# ---------------------------------------------------------------------------
# ONNX side: weighted ops in graph order
# ---------------------------------------------------------------------------

@dataclass
class WeightedOp:
    kind: str  # "conv" | "bn" | "dense" | "gru"
    node: wire.Node
    kernel: Optional[np.ndarray] = None
    bias: Optional[np.ndarray] = None
    scale: Optional[np.ndarray] = None
    mean: Optional[np.ndarray] = None
    var: Optional[np.ndarray] = None
    epsilon: float = 1e-5
    trans_b: bool = False
    output: str = ""
    # graph-side tensor names feeding this op (as written in node.inputs;
    # may be Identity/Transpose-routed — retroplant resolves them back to
    # the underlying initializers)
    input_names: dict = field(default_factory=dict)
    # gru: recurrent kernel R (num_dirs, 3H, H); kernel holds W
    # (num_dirs, 3H, I), bias holds B (num_dirs, 6H)
    rec_kernel: Optional[np.ndarray] = None
    num_dirs: int = 1
    linear_before_reset: bool = False
    # bn synthesized from a keras/tf2onnx-style Mul+Add decomposition; the
    # graph holds folded per-channel constants, not the four BN statistics.
    # const_shapes records the on-wire constant shapes (e.g. (C, 1) or
    # (1, C, 1, 1)) so retroplant can write back in the exporter's layout.
    decomposed: bool = False
    const_shapes: dict = field(default_factory=dict)


def onnx_weighted_ops(model: wire.Model) -> list[WeightedOp]:
    """Conv / BatchNormalization / Gemm / MatMul(+Add) / GRU ops carrying
    weights, in graph node order."""
    graph = model.graph
    inits = {name: t.to_numpy() for name, t in graph.initializers.items()}
    # non-folding exports route weights through Identity/Constant nodes,
    # and Linear-on-3D weights through a Transpose ((out,in) initializer ->
    # MatMul's (in,out) operand) — resolve all three so the weighted-op scan
    # sees the tensor the consuming node actually receives
    for node in graph.nodes:
        if node.op_type == "Identity" and node.inputs[0] in inits:
            inits[node.outputs[0]] = inits[node.inputs[0]]
        elif node.op_type == "Transpose" and node.inputs[0] in inits:
            w = inits[node.inputs[0]]
            perm = node.attr("perm") or list(range(w.ndim))[::-1]
            inits[node.outputs[0]] = np.transpose(w, perm)
        elif node.op_type == "Constant" and node.outputs[0] not in inits:
            t = node.attr("value")
            if t is not None:
                inits[node.outputs[0]] = np.asarray(t)
    ops: list[WeightedOp] = []
    consumed_adds: set[int] = set()
    nodes = graph.nodes
    for idx, node in enumerate(nodes):
        if idx in consumed_adds:
            continue
        if node.op_type == "Conv" and node.inputs[1] in inits:
            ops.append(
                WeightedOp(
                    "conv",
                    node,
                    kernel=inits[node.inputs[1]],
                    bias=inits.get(node.inputs[2])
                    if len(node.inputs) > 2
                    else None,
                    output=node.outputs[0],
                    input_names={
                        "kernel": node.inputs[1],
                        **(
                            {"bias": node.inputs[2]}
                            if len(node.inputs) > 2
                            else {}
                        ),
                    },
                )
            )
        elif node.op_type == "BatchNormalization":
            ops.append(
                WeightedOp(
                    "bn",
                    node,
                    scale=inits[node.inputs[1]],
                    bias=inits[node.inputs[2]],
                    mean=inits[node.inputs[3]],
                    var=inits[node.inputs[4]],
                    epsilon=float(node.attr("epsilon", 1e-5)),
                    output=node.outputs[0],
                    input_names={
                        "scale": node.inputs[1],
                        "bias": node.inputs[2],
                        "mean": node.inputs[3],
                        "var": node.inputs[4],
                    },
                )
            )
        elif node.op_type == "Gemm" and node.inputs[1] in inits:
            ops.append(
                WeightedOp(
                    "dense",
                    node,
                    kernel=inits[node.inputs[1]],
                    bias=inits.get(node.inputs[2])
                    if len(node.inputs) > 2
                    else None,
                    trans_b=bool(node.attr("transB", 0)),
                    output=node.outputs[0],
                    input_names={
                        "kernel": node.inputs[1],
                        **(
                            {"bias": node.inputs[2]}
                            if len(node.inputs) > 2
                            else {}
                        ),
                    },
                )
            )
        elif node.op_type == "LayerNormalization" and node.inputs[1] in inits:
            ops.append(
                WeightedOp(
                    "ln",
                    node,
                    scale=inits[node.inputs[1]],
                    bias=inits.get(node.inputs[2])
                    if len(node.inputs) > 2 and node.inputs[2]
                    else None,
                    epsilon=float(node.attr("epsilon", 1e-5)),
                    output=node.outputs[0],
                    input_names={
                        "scale": node.inputs[1],
                        **(
                            {"bias": node.inputs[2]}
                            if len(node.inputs) > 2 and node.inputs[2]
                            else {}
                        ),
                    },
                )
            )
        elif node.op_type == "GRU" and node.inputs[1] in inits:
            w = inits[node.inputs[1]]  # (num_dirs, 3H, I), gates z|r|h
            ops.append(
                WeightedOp(
                    "gru",
                    node,
                    kernel=w,
                    rec_kernel=inits[node.inputs[2]],
                    bias=inits.get(node.inputs[3])
                    if len(node.inputs) > 3 and node.inputs[3]
                    else None,
                    num_dirs=w.shape[0],
                    linear_before_reset=bool(
                        node.attr("linear_before_reset", 0)
                    ),
                    output=node.outputs[0] if node.outputs else "",
                    input_names={
                        "kernel": node.inputs[1],
                        "rec_kernel": node.inputs[2],
                        **(
                            {"bias": node.inputs[3]}
                            if len(node.inputs) > 3 and node.inputs[3]
                            else {}
                        ),
                    },
                )
            )
        elif (
            node.op_type == "Mul"
            and len(node.inputs) == 2
            and sum(i in inits for i in node.inputs) == 1
        ):
            # keras/tf2onnx idiom: BatchNorm decomposed into
            # Mul(x, gamma/sqrt(var+eps)) + Add(., beta - mean*scale) with
            # per-channel broadcast constants. Synthesize a "bn" op whose
            # statistics make the Flax BatchNorm the exact same affine map
            # (mean 0, stored var 1 - eps so the denominator is exactly 1).
            s_name = next(i for i in node.inputs if i in inits)
            s = inits[s_name]
            if not (s.size > 1 and s.size == max(s.shape, default=0)):
                continue  # not a per-channel constant
            for jdx in range(idx + 1, min(idx + 3, len(nodes))):
                nxt = nodes[jdx]
                if (
                    nxt.op_type == "Add"
                    and node.outputs[0] in nxt.inputs
                    and any(i in inits for i in nxt.inputs)
                ):
                    b_name = next(i for i in nxt.inputs if i in inits)
                    b = inits[b_name]
                    if b.shape != s.shape:
                        break
                    c = s.size
                    ops.append(
                        WeightedOp(
                            "bn",
                            node,
                            scale=s.reshape(c).astype(np.float32),
                            bias=b.reshape(c).astype(np.float32),
                            mean=np.zeros(c, np.float32),
                            var=np.full(c, 1.0 - _FLAX_BN_EPS, np.float32),
                            epsilon=_FLAX_BN_EPS,
                            output=nxt.outputs[0],
                            input_names={"scale": s_name, "bias": b_name},
                            decomposed=True,
                            const_shapes={
                                "scale": s.shape, "bias": b.shape,
                            },
                        )
                    )
                    consumed_adds.add(jdx)
                    break
        elif node.op_type == "MatMul" and node.inputs[1] in inits:
            op = WeightedOp(
                "dense", node, kernel=inits[node.inputs[1]],
                output=node.outputs[0],
                input_names={"kernel": node.inputs[1]},
            )
            # fuse the canonical MatMul+Add bias pattern the torch exporter
            # writes for Linear
            for jdx in range(idx + 1, min(idx + 3, len(nodes))):
                nxt = nodes[jdx]
                if (
                    nxt.op_type == "Add"
                    and node.outputs[0] in nxt.inputs
                    and any(i in inits for i in nxt.inputs)
                ):
                    bias_name = next(i for i in nxt.inputs if i in inits)
                    op.bias = inits[bias_name]
                    op.output = nxt.outputs[0]
                    op.input_names["bias"] = bias_name
                    consumed_adds.add(jdx)
                    break
            ops.append(op)
    return ops


# ---------------------------------------------------------------------------
# Flax side: weighted layers in execution order
# ---------------------------------------------------------------------------

@dataclass
class FlaxLayer:
    kind: str  # "conv" | "bn" | "dense" | "gru" | "ln"
    path: tuple[str, ...]
    has_bias: bool = False
    folded_from_conv: bool = False  # set during matching
    epsilon: Optional[float] = None  # ln only


_LEAF_KINDS = {nn.Conv: "conv", nn.BatchNorm: "bn", nn.Dense: "dense",
               nn.DenseGeneral: "dense", nn.GRUCell: "gru",
               nn.LayerNorm: "ln"}


def flax_execution_order(
    module: nn.Module, variables, sample_x, **apply_kwargs
) -> list[FlaxLayer]:
    """Weighted leaf layers (Conv/BatchNorm/Dense/GRUCell) in execution
    order, recorded with an interceptor around a real forward pass. A
    GRUCell is one unit: its six internal gate Dense layers are owned by
    the cell, not matched individually (they arrive as ONE ONNX GRU node
    direction)."""
    seen: list[FlaxLayer] = []
    cell_paths: list[tuple[str, ...]] = []

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        kind = _LEAF_KINDS.get(type(mod))
        if kind is not None and context.method_name == "__call__":
            path = tuple(p for p in mod.path)
            inside_cell = any(
                path[: len(c)] == c and path != c for c in cell_paths
            )
            if not inside_cell and (not seen or seen[-1].path != path):
                has_bias = bool(getattr(mod, "use_bias", True))
                seen.append(
                    FlaxLayer(
                        kind, path, has_bias=has_bias,
                        epsilon=getattr(mod, "epsilon", None)
                        if kind == "ln" else None,
                    )
                )
                if kind == "gru":
                    cell_paths.append(path)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        module.apply(variables, sample_x, **apply_kwargs)
    return seen


# ---------------------------------------------------------------------------
# Matching + assignment
# ---------------------------------------------------------------------------

def _set_in(tree: dict, path: tuple[str, ...], leaf_name: str, value,
            reshape_ok: bool = False):
    node = tree
    for p in path:
        node = node[p]
    old = node[leaf_name]
    if tuple(old.shape) != tuple(value.shape):
        # DenseGeneral packs the embed dim into (heads, head_dim) axes; a
        # row-major reshape of the 2-D exporter matrix is exactly torch's
        # contiguous head packing, so size-preserving reshapes are sound
        # for dense kernels/biases (and only requested for them)
        if reshape_ok and old.size == np.prod(value.shape):
            value = np.asarray(value).reshape(old.shape)
        else:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}/{leaf_name}: "
                f"flax {tuple(old.shape)} vs onnx {tuple(value.shape)}"
            )
    node[leaf_name] = jnp.asarray(value, dtype=old.dtype)


def _peek_in(tree: dict, path: tuple[str, ...], leaf_name: str):
    node = tree
    for p in path:
        node = node[p]
    return node[leaf_name]


def _conv_kernel_to_flax(kernel: np.ndarray) -> np.ndarray:
    if kernel.ndim == 4:  # OIHW -> HWIO
        return kernel.transpose(2, 3, 1, 0)
    if kernel.ndim == 3:  # OIW -> WIO
        return kernel.transpose(2, 1, 0)
    raise ValueError(f"unsupported conv kernel rank {kernel.ndim}")


@dataclass
class TransplantEntry:
    flax_path: str
    onnx_node: str
    onnx_output: str
    kind: str
    folded: bool = False
    max_abs_diff: Optional[float] = None
    # where to compare: a folded conv's graph output includes the BN bias,
    # so it must be checked against the Flax BatchNorm's output, not the
    # bias-less Conv's
    verify_path: str = ""

    def __post_init__(self):
        if not self.verify_path:
            self.verify_path = self.flax_path


@dataclass
class TransplantReport:
    entries: list[TransplantEntry] = field(default_factory=list)
    final_max_abs_diff: Optional[float] = None

    def __str__(self) -> str:
        lines = [
            f"{e.flax_path:55s} <- {e.kind:5s} {e.onnx_node or e.onnx_output}"
            + (" [folded-bn]" if e.folded else "")
            + (
                f"  maxdiff={e.max_abs_diff:.3e}"
                if e.max_abs_diff is not None
                else ""
            )
            for e in self.entries
        ]
        if self.final_max_abs_diff is not None:
            lines.append(f"{'FINAL OUTPUT':55s} maxdiff="
                         f"{self.final_max_abs_diff:.3e}")
        return "\n".join(lines)


# flax BatchNorm default epsilon (kept explicit: the transplant shifts
# variance by eps_onnx - eps_flax so both normalizations agree exactly)
_FLAX_BN_EPS = 1e-5


def transplant(
    model: wire.Model,
    module: nn.Module,
    variables,
    sample_x,
    **apply_kwargs,
) -> tuple[Any, TransplantReport]:
    """Import the graph's weights into the Flax module's variables.

    Returns (new_variables, report). Raises on any unmatched or
    shape-incompatible layer — a transplant is all-or-nothing."""
    ops = onnx_weighted_ops(model)
    layers = flax_execution_order(module, variables, sample_x, **apply_kwargs)

    tree = unfreeze(variables)
    params = tree.get("params", tree)
    batch_stats = tree.get("batch_stats", {})
    report = TransplantReport()

    def _set_gru_direction(path: tuple[str, ...], op: WeightedOp, d: int):
        """Assign direction ``d`` of an ONNX GRU node to the flax GRUCell at
        ``path``. ONNX gate order is z|r|h over rows of W/R; B is
        [Wb_z Wb_r Wb_h Rb_z Rb_r Rb_h] (one row per direction). Flax
        GRUCell computes r/z with a single input-side bias (so Wb+Rb fold
        together) and n = tanh(in(x) + r * hn(h)) with hn carrying its own
        bias — exactly ONNX's linear_before_reset=1 form (what the torch
        exporter emits for nn.GRU)."""
        if not op.linear_before_reset:
            raise ValueError(
                "GRU with linear_before_reset=0 does not map onto "
                "flax.linen.GRUCell (reset applied after the hidden matmul)"
            )
        hidden = op.rec_kernel.shape[-1]
        w, r = op.kernel[d], op.rec_kernel[d]
        b = (
            op.bias[d]
            if op.bias is not None
            else np.zeros(6 * hidden, np.float32)
        )
        wz, wr, wh = np.split(w, 3, axis=0)
        rz, rr, rh = np.split(r, 3, axis=0)
        wbz, wbr, wbh, rbz, rbr, rbh = np.split(b, 6)
        for sub, kernel, bias in (
            ("iz", wz.T, wbz + rbz),
            ("ir", wr.T, wbr + rbr),
            ("in", wh.T, wbh),
            ("hz", rz.T, None),
            ("hr", rr.T, None),
            ("hn", rh.T, rbh),
        ):
            _set_in(params, path + (sub,), "kernel", kernel)
            if bias is not None:
                _set_in(params, path + (sub,), "bias", bias)

    oi = 0
    li = 0
    gru_dir = 0  # direction cursor within the current (bidirectional) GRU op
    while li < len(layers):
        layer = layers[li]
        path_str = "/".join(layer.path)
        if layer.kind == "conv":
            if oi >= len(ops) or ops[oi].kind != "conv":
                raise ValueError(
                    f"graph op {oi} is "
                    f"{ops[oi].kind if oi < len(ops) else 'EOF'}, "
                    f"expected conv for {path_str}"
                )
            op = ops[oi]
            kernel = _conv_kernel_to_flax(op.kernel)
            want = _peek_in(params, layer.path, "kernel")
            if kernel.ndim == want.ndim + 1 and kernel.shape[0] == 1:
                # tf2onnx runs 1-D convs as 2-D inside an Unsqueeze/Conv/
                # Squeeze chain: HWIO (1, K, I, O) -> flax WIO (K, I, O)
                kernel = kernel[0]
            _set_in(params, layer.path, "kernel", kernel)
            folded = False
            if op.bias is not None:
                if layer.has_bias:
                    _set_in(params, layer.path, "bias", op.bias)
                elif (
                    li + 1 < len(layers)
                    and layers[li + 1].kind == "bn"
                    and (oi + 1 >= len(ops) or ops[oi + 1].kind != "bn")
                ):
                    # exporter folded the BatchNorm into the conv bias:
                    # collapse the Flax BN to an exact identity-with-bias
                    bn = layers[li + 1]
                    c = op.bias.shape[0]
                    _set_in(params, bn.path, "scale", np.ones(c, np.float32))
                    _set_in(params, bn.path, "bias",
                            op.bias.astype(np.float32))
                    _set_in(batch_stats, bn.path, "mean",
                            np.zeros(c, np.float32))
                    _set_in(batch_stats, bn.path, "var",
                            np.full(c, 1.0 - _FLAX_BN_EPS, np.float32))
                    bn.folded_from_conv = True
                    folded = True
                else:
                    raise ValueError(
                        f"conv bias with no home at {path_str}"
                    )
            report.entries.append(
                TransplantEntry(
                    path_str, op.node.name, op.output, "conv", folded=folded,
                    verify_path="/".join(layers[li + 1].path)
                    if folded else "",
                )
            )
            oi += 1
        elif layer.kind == "bn":
            if layer.folded_from_conv:
                report.entries.append(
                    TransplantEntry(path_str, "", "", "bn", folded=True)
                )
            else:
                if oi >= len(ops) or ops[oi].kind != "bn":
                    raise ValueError(
                        f"graph op {oi} is "
                        f"{ops[oi].kind if oi < len(ops) else 'EOF'}, "
                        f"expected bn for {path_str}"
                    )
                op = ops[oi]
                _set_in(params, layer.path, "scale", op.scale)
                _set_in(params, layer.path, "bias", op.bias)
                _set_in(batch_stats, layer.path, "mean", op.mean)
                _set_in(
                    batch_stats, layer.path, "var",
                    op.var + (op.epsilon - _FLAX_BN_EPS),
                )
                report.entries.append(
                    TransplantEntry(path_str, op.node.name, op.output, "bn")
                )
                oi += 1
        elif layer.kind == "gru":
            if oi >= len(ops) or ops[oi].kind != "gru":
                raise ValueError(
                    f"graph op {oi} is "
                    f"{ops[oi].kind if oi < len(ops) else 'EOF'}, "
                    f"expected gru for {path_str}"
                )
            op = ops[oi]
            _set_gru_direction(layer.path, op, gru_dir)
            report.entries.append(
                TransplantEntry(
                    path_str, op.node.name,
                    # the GRU node's raw Y layout (seq, dirs, batch, H)
                    # never aligns with a flax capture — skip per-layer
                    # verification; the final-output diff covers it
                    "",
                    f"gru[d{gru_dir}]",
                )
            )
            gru_dir += 1
            if gru_dir >= op.num_dirs:
                gru_dir = 0
                oi += 1
        elif layer.kind == "dense":
            if oi >= len(ops) or ops[oi].kind != "dense":
                raise ValueError(
                    f"graph op {oi} is "
                    f"{ops[oi].kind if oi < len(ops) else 'EOF'}, "
                    f"expected dense for {path_str}"
                )
            op = ops[oi]
            kernel = op.kernel
            if op.node.op_type == "Gemm" and op.trans_b:
                kernel = kernel.T  # (out,in) -> (in,out)
            _set_in(params, layer.path, "kernel", kernel, reshape_ok=True)
            if op.bias is not None:
                _set_in(params, layer.path, "bias", op.bias, reshape_ok=True)
            report.entries.append(
                TransplantEntry(path_str, op.node.name, op.output, "dense")
            )
            oi += 1
        elif layer.kind == "ln":
            if oi >= len(ops) or ops[oi].kind != "ln":
                raise ValueError(
                    f"graph op {oi} is "
                    f"{ops[oi].kind if oi < len(ops) else 'EOF'}, "
                    f"expected ln for {path_str}"
                )
            op = ops[oi]
            # LayerNorm's epsilon sits inside a data-dependent variance —
            # unlike BatchNorm there is no stored statistic to shift, so the
            # module hyperparameter must already agree with the checkpoint
            if (
                layer.epsilon is not None
                and abs(layer.epsilon - op.epsilon) > 1e-12
            ):
                raise ValueError(
                    f"LayerNorm epsilon mismatch at {path_str}: flax "
                    f"{layer.epsilon} vs onnx {op.epsilon}; construct the "
                    f"module with epsilon={op.epsilon}"
                )
            _set_in(params, layer.path, "scale", op.scale)
            if op.bias is not None:
                _set_in(params, layer.path, "bias", op.bias)
            report.entries.append(
                TransplantEntry(path_str, op.node.name, op.output, "ln")
            )
            oi += 1
        li += 1

    if oi != len(ops):
        raise ValueError(
            f"{len(ops) - oi} weighted graph ops left unmatched "
            f"(first: {ops[oi].kind} {ops[oi].node.name})"
        )

    new_vars = {"params": params}
    if batch_stats:
        new_vars["batch_stats"] = batch_stats
    for k, v in tree.items():
        if k not in new_vars:
            new_vars[k] = v
    return freeze(new_vars), report


# ---------------------------------------------------------------------------
# Verification: per-layer diffs between the two implementations
# ---------------------------------------------------------------------------

def verify_transplant(
    model: wire.Model,
    module: nn.Module,
    variables,
    sample_x: np.ndarray,
    report: TransplantReport,
    graph_input: Optional[np.ndarray] = None,
    **apply_kwargs,
) -> TransplantReport:
    """Fill the report with per-matched-layer max-abs diffs between the
    graph executor's intermediate tensors and the Flax module's captured
    intermediates, plus the final-output diff. ``graph_input`` overrides the
    array fed to the graph when its layout differs from the Flax input."""
    from ocr_inference_tpu.onnx.runner import OnnxGraphFunction

    # flax intermediates, keyed by module path
    out_flax, state = module.apply(
        variables, sample_x, capture_intermediates=True, mutable=["intermediates"],
        **apply_kwargs,
    )
    inter = state["intermediates"]

    def flax_out(path: tuple[str, ...]):
        node = inter
        for p in path:
            if p not in node:
                return None
            node = node[p]
        got = node.get("__call__")
        return np.asarray(got[0]) if got else None

    # graph intermediates: request every matched op output as a graph output
    wanted = [e.onnx_output for e in report.entries if e.onnx_output]
    gx = graph_input if graph_input is not None else sample_x
    fn = OnnxGraphFunction(model, output_names=wanted)
    got = dict(zip(wanted, fn(fn.weights, jnp.asarray(gx))))

    for entry in report.entries:
        if not entry.onnx_output or entry.onnx_output not in got:
            continue
        f = flax_out(tuple(entry.verify_path.split("/")))
        if f is None:
            continue
        g = np.asarray(got[entry.onnx_output])
        # NCHW/NCW graph tensor vs NHWC/NWC flax tensor. When the shape is
        # transpose-symmetric (e.g. a (1, 16, 16, 16) feature map) the
        # layout cannot be told from shapes alone — compare both and keep
        # the smaller diff (the transplant itself is exact; this check is
        # advisory per-layer localization).
        candidates = [g]
        if g.ndim == f.ndim and g.ndim in (3, 4):
            perm = (0, 2, 3, 1) if g.ndim == 4 else (0, 2, 1)
            candidates.append(g.transpose(perm))
        diffs = [
            float(np.max(np.abs(c - f)))
            for c in candidates
            if c.shape == f.shape
        ]
        if diffs:
            entry.max_abs_diff = min(diffs)

    final_fn = OnnxGraphFunction(model)
    final = np.asarray(final_fn(final_fn.weights, jnp.asarray(gx))[0])
    out = np.asarray(out_flax)
    if final.ndim == out.ndim and final.shape != out.shape:
        if final.ndim == 4:
            final = final.transpose(0, 2, 3, 1)
        elif final.ndim == 3:
            final = final.transpose(0, 2, 1)
    report.final_max_abs_diff = float(np.max(np.abs(final - out)))
    return report
