"""Import the reference's published Keras ``.h5``/``.hdf5`` weights.

The reference's deliverable models are Keras HDF5 blobs saved by
``model.save`` / ``ModelCheckpoint`` (utils/model_tools.py:1128-1269). This
module reads that format (h5py, no TensorFlow needed) and maps the U-Net
family onto this framework's flax modules, so BASELINE.md's quality targets
can be checked against the actual published weights.

Architecture note: the reference's ``conv_block.call`` invokes its first
conv_batch_act twice and never the second (utils/model_tools.py:238-239),
so saved files contain ONE conv+BN per encoder/center block. Build the
target as ``UNet(..., convs_per_block=1)`` to receive them; the loader
verifies the unit counts line up and says so if not.

Tensor conventions (verified empirically against tf.keras on this image):
- Conv2D kernels are stored HWIO — flax ``nn.Conv`` order already;
- Conv2DTranspose kernels are stored (kh, kw, out, in) and Keras computes
  the gradient-of-conv: flax ``nn.ConvTranspose`` needs the kernel
  spatially flipped then transposed to (kh, kw, in, out);
- BatchNorm: gamma/beta -> scale/bias (params), moving_mean/moving_variance
  -> mean/var (batch_stats). Keras epsilon 1e-3 == blocks.ConvBNAct.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax

__all__ = [
    "read_keras_h5_units",
    "load_keras_unet_h5",
    "load_keras_siamese_h5",
]


def _decode(name) -> str:
    return name.decode() if isinstance(name, bytes) else str(name)


def _layer_weights(f) -> List[Tuple[str, List[Tuple[str, np.ndarray]]]]:
    """(layer_name, [(weight_path, array), ...]) in Keras creation order,
    for both full-model files (``model_weights`` group) and
    ``save_weights`` files (layers at root)."""
    g = f["model_weights"] if "model_weights" in f else f
    if "layer_names" not in g.attrs:
        raise ValueError("not a Keras HDF5 weights file (no layer_names attr)")
    out = []
    for lname in g.attrs["layer_names"]:
        lname = _decode(lname)
        grp = g[lname]
        wnames = [_decode(n) for n in grp.attrs.get("weight_names", [])]
        out.append((lname, [(n, np.asarray(grp[n])) for n in wnames]))
    return out


class _Unit:
    """One parameterized layer: conv / conv_transpose / batch norm."""

    def __init__(self, path: str):
        self.path = path
        self.tensors: Dict[str, np.ndarray] = {}

    @property
    def kind(self) -> str:
        if "gamma" in self.tensors:
            return "bn"
        k = self.tensors.get("kernel")
        if k is None:
            return "other"
        if "transpose" in self.path.rsplit("/", 1)[-1]:
            return "conv_transpose"
        return "conv"


def read_keras_h5_units(path_or_bytes):
    """Parse a Keras HDF5 file into ordered (layer_name, [units]) where each
    unit is one conv / conv-transpose / BN with its tensors by basename."""
    import h5py

    src = io.BytesIO(path_or_bytes) if isinstance(path_or_bytes, bytes) else path_or_bytes
    with h5py.File(src, "r") as f:
        layers = _layer_weights(f)

    result = []
    for lname, weights in layers:
        units: List[_Unit] = []
        by_parent: Dict[str, _Unit] = {}
        for wpath, arr in weights:
            parent, _, base = wpath.rpartition("/")
            base = base.split(":")[0]
            if parent not in by_parent:
                by_parent[parent] = _Unit(parent)
                units.append(by_parent[parent])
            by_parent[parent].tensors[base] = arr
        result.append((lname, units))
    return result


def _conv_params(u: _Unit) -> Dict[str, np.ndarray]:
    p = {"kernel": u.tensors["kernel"]}
    if "bias" in u.tensors:
        p["bias"] = u.tensors["bias"]
    return p


def _conv_transpose_params(u: _Unit) -> Dict[str, np.ndarray]:
    k = u.tensors["kernel"]  # (kh, kw, out, in)
    p = {"kernel": k[::-1, ::-1].transpose(0, 1, 3, 2).copy()}
    if "bias" in u.tensors:
        p["bias"] = u.tensors["bias"]
    return p


def _bn_params(u: _Unit):
    params = {"scale": u.tensors["gamma"], "bias": u.tensors["beta"]}
    stats = {"mean": u.tensors["moving_mean"], "var": u.tensors["moving_variance"]}
    return params, stats


def load_keras_unet_h5(path_or_bytes, params, batch_stats):
    """Map a reference U-Net ``.h5`` onto a ``models.UNet`` params/stats pair.

    Expects the binary/multiclass/autoencoder U-Net families built by
    utils/model_tools.py:321-531: encoder blocks (Keras Layer subclasses,
    each one effective conv+BN — or two if a fixed fork saved them), a
    center conv_block, functional decoder_blocks (convT + BN + 2x(conv+BN)),
    and a 1x1 head conv. Returns updated ``(params, batch_stats)``.
    """
    layers = read_keras_h5_units(path_or_bytes)

    encoders: List[List[_Unit]] = []
    center: Optional[List[_Unit]] = None
    flat: List[_Unit] = []  # decoder constituents + head, in creation order
    for lname, units in layers:
        if not units:
            continue
        nested = any("conv_batch_act" in u.path for u in units)
        if nested and center is None and not lname.startswith("conv_block"):
            encoders.append(units)
        elif nested or lname.startswith("conv_block"):
            if center is not None:
                raise ValueError(f"second center conv_block {lname!r}")
            center = units
        else:
            flat.extend(units)

    if center is None:
        raise ValueError("no center conv_block found in the h5 file")
    if not flat or flat[0].kind != "conv_transpose":
        raise ValueError("no decoder conv_transpose units found")
    head_unit = flat[-1]
    if head_unit.kind != "conv":
        raise ValueError(f"expected trailing head conv, got {head_unit.kind}")
    decoder_units = flat[:-1]

    # split decoder units into levels at each conv_transpose
    decoders: List[List[_Unit]] = []
    for u in decoder_units:
        if u.kind == "conv_transpose":
            decoders.append([u])
        else:
            decoders[-1].append(u)
    if len(decoders) != len(encoders):
        raise ValueError(
            f"{len(encoders)} encoder blocks but {len(decoders)} decoder levels"
        )

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def assign_cba_seq(units: List[_Unit], p_tree, s_tree, where: str):
        """conv/BN unit pairs -> ConvBNAct_i subtrees of a ConvBlock."""
        convs = [u for u in units if u.kind == "conv"]
        bns = [u for u in units if u.kind == "bn"]
        want = len([k for k in p_tree if k.startswith("ConvBNAct_")])
        if len(convs) != want or len(bns) != want:
            raise ValueError(
                f"{where}: h5 has {len(convs)} conv(s) per block but the model "
                f"expects {want} — build UNet(convs_per_block={len(convs)}) "
                "(the reference's shipped architecture has 1: conv_block "
                "double-call, utils/model_tools.py:238-239)"
            )
        for i, (cu, bu) in enumerate(zip(convs, bns)):
            sub = p_tree[f"ConvBNAct_{i}"]
            _check_shape(sub["Conv_0"]["kernel"], cu.tensors["kernel"], where)
            sub["Conv_0"].update(_conv_params(cu))
            bp, bs = _bn_params(bu)
            sub["BatchNorm_0"].update(bp)
            s_tree[f"ConvBNAct_{i}"]["BatchNorm_0"].update(bs)

    def _check_shape(dst, src, where):
        if tuple(np.shape(dst)) != tuple(np.shape(src)):
            raise ValueError(
                f"{where}: kernel shape mismatch {np.shape(src)} (h5) vs "
                f"{np.shape(dst)} (model) — filters/factors/bands differ"
            )

    for i, units in enumerate(encoders):
        name = f"EncoderBlock_{i}"
        assign_cba_seq(
            units,
            params[name]["ConvBlock_0"],
            batch_stats[name]["ConvBlock_0"],
            name,
        )
    assign_cba_seq(center, params["ConvBlock_0"], batch_stats["ConvBlock_0"], "center")

    for i, units in enumerate(decoders):
        name = f"DecoderBlock_{i}"
        p, s = params[name], batch_stats[name]
        kinds = [u.kind for u in units]
        if kinds != ["conv_transpose", "bn", "conv", "bn", "conv", "bn"]:
            raise ValueError(f"{name}: unexpected decoder unit sequence {kinds}")
        _check_shape(
            p["ConvTranspose_0"]["kernel"],
            units[0].tensors["kernel"].transpose(0, 1, 3, 2),
            name,
        )
        p["ConvTranspose_0"].update(_conv_transpose_params(units[0]))
        for bn_idx, unit in ((0, units[1]), (1, units[3]), (2, units[5])):
            bp, bs = _bn_params(unit)
            p[f"BatchNorm_{bn_idx}"].update(bp)
            s[f"BatchNorm_{bn_idx}"].update(bs)
        for conv_idx, unit in ((0, units[2]), (1, units[4])):
            _check_shape(p[f"Conv_{conv_idx}"]["kernel"], unit.tensors["kernel"], name)
            p[f"Conv_{conv_idx}"].update(_conv_params(unit))

    _check_shape(params["head"]["kernel"], head_unit.tensors["kernel"], "head")
    params["head"].update(_conv_params(head_unit))

    to_f32 = lambda t: jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), t)
    return to_f32(params), to_f32(batch_stats)


def load_keras_siamese_h5(path_or_bytes, params, batch_stats):
    """Map a reference Siamese U-Net ``.h5`` onto ``models.SiameseUNet``.

    Reference builder: get_siamese_layers / make_siamese_unet
    (utils/model_tools.py:576-663) — weight-shared encoder_block Layers,
    one shared DilatedSpatialPyramidPooling, functional decoder_blocks and
    a sigmoid 'probs' head. The ASPP Layer *tracks* its sublayers in
    creation order (cba 1x1, [cba2 unbuilt], cba3 fuse-1x1, then the
    dilated 3x3s), so its units are assigned by kernel shape: the 1x1
    whose input width is 4x features is the fuse conv; the 3x3s keep their
    creation order (dilations 3, 6, 12 — dilation is not a weight).
    Returns updated ``(params, batch_stats)``.
    """
    layers = read_keras_h5_units(path_or_bytes)

    encoders: List[List[_Unit]] = []
    aspp: Optional[List[_Unit]] = None
    flat: List[_Unit] = []
    for lname, units in layers:
        if not units:
            continue
        nested = any("conv_batch_act" in u.path for u in units)
        n_convs = sum(1 for u in units if u.kind == "conv")
        if nested and n_convs >= 4:
            if aspp is not None:
                raise ValueError(f"second ASPP-like group {lname!r}")
            aspp = units
        elif nested:
            encoders.append(units)
        else:
            flat.extend(units)

    if aspp is None:
        raise ValueError("no ASPP group found (not a siamese .h5?)")
    head_unit = flat[-1]
    if not flat or head_unit.kind != "conv":
        raise ValueError("expected trailing head conv")
    decoders: List[List[_Unit]] = []
    for u in flat[:-1]:
        if u.kind == "conv_transpose":
            decoders.append([u])
        else:
            if not decoders:
                raise ValueError("decoder units precede the first conv_transpose")
            decoders[-1].append(u)
    if len(decoders) != len(encoders):
        raise ValueError(
            f"{len(encoders)} encoder blocks but {len(decoders)} decoder levels"
        )

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def _check_shape(dst, src, where):
        if tuple(np.shape(dst)) != tuple(np.shape(src)):
            raise ValueError(
                f"{where}: kernel shape mismatch {np.shape(src)} (h5) vs "
                f"{np.shape(dst)} (model)"
            )

    def assign_cba(p_tree, s_tree, conv_unit, bn_unit, where):
        _check_shape(p_tree["Conv_0"]["kernel"], conv_unit.tensors["kernel"], where)
        p_tree["Conv_0"].update(_conv_params(conv_unit))
        bp, bs = _bn_params(bn_unit)
        p_tree["BatchNorm_0"].update(bp)
        s_tree["BatchNorm_0"].update(bs)

    # encoders (single effective cba per block: the conv_block bug)
    for i, units in enumerate(encoders):
        convs = [u for u in units if u.kind == "conv"]
        bns = [u for u in units if u.kind == "bn"]
        name = f"encoder_{i}"
        want = len([k for k in params[name]["ConvBlock_0"] if k.startswith("ConvBNAct_")])
        if len(convs) != want:
            raise ValueError(
                f"{name}: h5 has {len(convs)} conv(s) per block but the model "
                f"expects {want} — build SiameseUNet(convs_per_block={len(convs)})"
            )
        for ci, (cu, bu) in enumerate(zip(convs, bns)):
            assign_cba(
                params[name]["ConvBlock_0"][f"ConvBNAct_{ci}"],
                batch_stats[name]["ConvBlock_0"][f"ConvBNAct_{ci}"],
                cu, bu, name,
            )

    # ASPP: units by shape — blocks.ASPP order is 1x1, d3, d6, d12, fuse
    convs = [u for u in aspp if u.kind == "conv"]
    bns = [u for u in aspp if u.kind == "bn"]
    if len(convs) != 5:
        raise ValueError(f"ASPP: expected 5 conv units, got {len(convs)}")
    features = convs[0].tensors["kernel"].shape[-1]
    ones = [(c, b) for c, b in zip(convs, bns) if c.tensors["kernel"].shape[:2] == (1, 1)]
    threes = [(c, b) for c, b in zip(convs, bns) if c.tensors["kernel"].shape[:2] == (3, 3)]
    if len(ones) != 2 or len(threes) != 3:
        raise ValueError("ASPP: expected two 1x1 and three 3x3 conv units")
    fuse = max(ones, key=lambda cb: cb[0].tensors["kernel"].shape[2])
    first = ones[0] if ones[1] is fuse else ones[1]
    if fuse[0].tensors["kernel"].shape[2] != 4 * features:
        raise ValueError("ASPP: could not identify the fuse conv by input width")
    order = [first, *threes, fuse]
    for ci, (cu, bu) in enumerate(order):
        assign_cba(
            params["aspp"][f"ConvBNAct_{ci}"],
            batch_stats["aspp"][f"ConvBNAct_{ci}"],
            cu, bu, f"aspp[{ci}]",
        )

    # decoders + head (same flat structure as the U-Net family)
    for i, units in enumerate(decoders):
        name = f"DecoderBlock_{i}"
        p, st = params[name], batch_stats[name]
        kinds = [u.kind for u in units]
        if kinds != ["conv_transpose", "bn", "conv", "bn", "conv", "bn"]:
            raise ValueError(f"{name}: unexpected decoder unit sequence {kinds}")
        _check_shape(
            p["ConvTranspose_0"]["kernel"],
            units[0].tensors["kernel"].transpose(0, 1, 3, 2),
            name,
        )
        p["ConvTranspose_0"].update(_conv_transpose_params(units[0]))
        for bn_idx, unit in ((0, units[1]), (1, units[3]), (2, units[5])):
            bp, bs = _bn_params(unit)
            p[f"BatchNorm_{bn_idx}"].update(bp)
            st[f"BatchNorm_{bn_idx}"].update(bs)
        for conv_idx, unit in ((0, units[2]), (1, units[4])):
            _check_shape(p[f"Conv_{conv_idx}"]["kernel"], unit.tensors["kernel"], name)
            p[f"Conv_{conv_idx}"].update(_conv_params(unit))

    _check_shape(params["head"]["kernel"], head_unit.tensors["kernel"], "head")
    params["head"].update(_conv_params(head_unit))

    to_f32 = lambda t: jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), t)
    return to_f32(params), to_f32(batch_stats)
