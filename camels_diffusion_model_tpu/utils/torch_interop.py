"""Torch checkpoint interop: import/export reference-format ``.pth`` weights.

The reference stores ``torch.save(model.state_dict())`` files
(train_diffusion_paper.py:477) with the module names of its ContextUnet
(init_conv/down1/down2/timeembed*/contextembed*/up0/up1/up2/out).  This module
maps those state dicts to/from this framework's Flax variables so users can
(a) load reference-trained checkpoints for TPU sampling and (b) export
TPU-trained weights back to the reference format.

Layout conversions:
* Conv2d          (O, I, kh, kw)  <-> flax Conv kernel (kh, kw, I, O)
* ConvTranspose2d (I, O, kh, kw)  <-> flax ConvTranspose kernel (kh, kw, I, O)
  with SPATIALLY FLIPPED kernels (torch's transposed conv scatters the kernel
  as-is; lax.conv_transpose correlates with the kernel, so the spatial axes
  reverse — verified numerically in tests/test_torch_interop.py).
* Linear          (O, I)          <-> flax Dense kernel (I, O)
* BatchNorm2d weight/bias/running_mean/running_var <-> scale/bias and
  batch_stats mean/var.
* GroupNorm weight/bias <-> scale/bias.

The reference's ``init_conv`` has no persistent shortcut parameter (it draws a
fresh 1x1 conv every forward, diffusion_utilities.py:54); on import, this
framework's learned shortcut is seeded with one fixed Kaiming-uniform draw
(documented divergence), and on export the shortcut is omitted to keep the
state dict reference-shaped.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# ---------------------------------------------------------------------------
# Name mapping
# ---------------------------------------------------------------------------


def _res_block(flax_prefix, torch_prefix, out):
    """ResidualConvBlock: convN -> Sequential(Conv2d, BatchNorm2d, ReLU)."""
    for i, stage in enumerate(("conv1", "conv2")):
        out.append(
            (
                (flax_prefix + (stage, "conv"), "kernel"),
                f"{torch_prefix}.{stage}.0.weight",
                "conv",
            )
        )
        out.append(
            (
                (flax_prefix + (stage, "conv"), "bias"),
                f"{torch_prefix}.{stage}.0.bias",
                "vec",
            )
        )
        out.append(
            (
                (flax_prefix + (f"{stage}_bn",), "scale"),
                f"{torch_prefix}.{stage}.1.weight",
                "vec",
            )
        )
        out.append(
            (
                (flax_prefix + (f"{stage}_bn",), "bias"),
                f"{torch_prefix}.{stage}.1.bias",
                "vec",
            )
        )
        out.append(
            (
                (flax_prefix + (f"{stage}_bn",), "mean"),
                f"{torch_prefix}.{stage}.1.running_mean",
                "bstat",
            )
        )
        out.append(
            (
                (flax_prefix + (f"{stage}_bn",), "var"),
                f"{torch_prefix}.{stage}.1.running_var",
                "bstat",
            )
        )


def _embed(flax_name, torch_name, out):
    out.append((((flax_name, "fc1"), "kernel"), f"{torch_name}.model.0.weight", "linear"))
    out.append((((flax_name, "fc1"), "bias"), f"{torch_name}.model.0.bias", "vec"))
    out.append((((flax_name, "fc2"), "kernel"), f"{torch_name}.model.2.weight", "linear"))
    out.append((((flax_name, "fc2"), "bias"), f"{torch_name}.model.2.bias", "vec"))


def canonical_name_map(levels: int = 2):
    """[(flax_path, torch_name, kind)] for the canonical ContextUnet.

    flax_path is ((module, ..., submodule), param_name); kind selects the
    layout conversion.  kind == 'bstat' entries live in batch_stats.
    """
    out = []
    _res_block(("init_conv",), "init_conv", out)
    for lv in range(1, levels + 1):
        for blk in ("block1", "block2"):
            tidx = {"block1": 0, "block2": 1}[blk]
            _res_block((f"down{lv}", blk), f"down{lv}.model.{tidx}", out)
    _embed("timeembed1", "timeembed1", out)
    _embed("timeembed2", "timeembed2", out)
    _embed("contextembed1", "contextembed1", out)
    _embed("contextembed2", "contextembed2", out)
    out.append(((("up0_conv",), "kernel"), "up0.0.weight", "convT"))
    out.append(((("up0_conv",), "bias"), "up0.0.bias", "vec"))
    out.append(((("up0_norm",), "scale"), "up0.1.weight", "vec"))
    out.append(((("up0_norm",), "bias"), "up0.1.bias", "vec"))
    for lv in range(1, levels + 1):
        out.append(
            (((f"up{lv}", "upconv"), "kernel"), f"up{lv}.model.0.weight", "convT")
        )
        out.append((((f"up{lv}", "upconv"), "bias"), f"up{lv}.model.0.bias", "vec"))
        for blk, tidx in (("block1", 1), ("block2", 2)):
            _res_block((f"up{lv}", blk), f"up{lv}.model.{tidx}", out)
    out.append(((("out_conv1",), "kernel"), "out.0.weight", "conv"))
    out.append(((("out_conv1",), "bias"), "out.0.bias", "vec"))
    out.append(((("out_norm",), "scale"), "out.1.weight", "vec"))
    out.append(((("out_norm",), "bias"), "out.1.bias", "vec"))
    out.append(((("out_conv2",), "kernel"), "out.3.weight", "conv"))
    out.append(((("out_conv2",), "bias"), "out.3.bias", "vec"))
    return out


# ---------------------------------------------------------------------------
# Layout conversions
# ---------------------------------------------------------------------------


def _to_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "convT":
        # IOHW -> HWIO with spatial flip (scatter vs correlate semantics)
        return np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1]
    if kind == "linear":
        return np.transpose(arr)  # (O, I) -> (I, O)
    return arr  # vec / bstat


def _to_torch(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (3, 2, 0, 1))
    if kind == "convT":
        return np.transpose(arr[::-1, ::-1], (2, 3, 0, 1))
    if kind == "linear":
        return np.transpose(arr)
    return arr


def _get(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def export_to_torch_state_dict(variables: Dict[str, Any], levels: int = 2):
    """Flax variables -> reference-format state dict (numpy arrays).

    Pass the result to ``torch.save({k: torch.from_numpy(v) ...})`` for a
    reference-loadable ``.pth``.  BatchNorm ``num_batches_tracked`` is set to
    0; the learned init_conv shortcut is omitted (see module docstring).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd = {}
    for (path, pname), torch_name, kind in canonical_name_map(levels):
        if kind == "bstat":
            arr = np.asarray(_get(batch_stats, path)[pname])
        else:
            arr = np.asarray(_get(params, path)[pname])
        sd[torch_name] = _to_torch(arr.astype(np.float32), kind)
    # num_batches_tracked sidecars for each BatchNorm
    for key in [k for k in sd if k.endswith("running_mean")]:
        sd[key.replace("running_mean", "num_batches_tracked")] = np.asarray(
            0, np.int64
        )
    return sd


def import_from_torch_state_dict(
    template_variables: Dict[str, Any],
    state_dict: Dict[str, Any],
    levels: int = 2,
    shortcut_seed: int = 0,
):
    """Reference-format state dict -> Flax variables.

    ``template_variables`` comes from ``model.init`` and provides the tree
    structure.  The learned init_conv shortcut has no reference counterpart
    (the reference draws a fresh 1x1 conv every forward,
    diffusion_utilities.py:54); it is re-seeded here with ONE fixed
    Kaiming-uniform draw from ``PRNGKey(shortcut_seed)`` so two imports of the
    same ``.pth`` give identical models regardless of the template's init.
    """
    import copy

    import jax

    params = jax.tree_util.tree_map(np.asarray, template_variables["params"])
    params = copy.deepcopy(jax.device_get(params))
    batch_stats = copy.deepcopy(
        jax.device_get(template_variables.get("batch_stats", {}))
    )

    def as_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v)

    for (path, pname), torch_name, kind in canonical_name_map(levels):
        if torch_name not in state_dict:
            raise KeyError(f"reference checkpoint missing {torch_name}")
        arr = _to_flax(as_np(state_dict[torch_name]).astype(np.float32), kind)
        target = batch_stats if kind == "bstat" else params
        node = _get(target, path)
        want_shape = np.asarray(node[pname]).shape
        if arr.shape != want_shape:
            raise ValueError(
                f"{torch_name}: shape {arr.shape} != expected {want_shape}"
            )
        node[pname] = arr
    shortcut = params.get("init_conv", {}).get("shortcut")
    if shortcut is not None:
        kshape = np.asarray(shortcut["kernel"]).shape  # (1, 1, I, O)
        bound = 1.0 / float(np.sqrt(kshape[2]))
        kkey, bkey = jax.random.split(jax.random.PRNGKey(shortcut_seed))
        shortcut["kernel"] = np.asarray(
            jax.random.uniform(kkey, kshape, jax.numpy.float32, -bound, bound)
        )
        shortcut["bias"] = np.asarray(
            jax.random.uniform(
                bkey, np.asarray(shortcut["bias"]).shape,
                jax.numpy.float32, -bound, bound,
            )
        )
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def save_torch_checkpoint(variables: Dict[str, Any], path: str, levels: int = 2):
    """Write a reference-loadable ``.pth`` (requires torch)."""
    import torch

    sd = export_to_torch_state_dict(variables, levels)
    torch_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v) else torch.tensor(v)
        for k, v in sd.items()
    }
    torch.save(torch_sd, path)


def load_torch_checkpoint(
    template_variables: Dict[str, Any], path: str, levels: int = 2
):
    """Load a reference ``.pth`` into Flax variables.

    Uses torch if available; otherwise falls back to the torch-free zip
    unpickler below (the reference saves plain ``state_dict`` files,
    train_diffusion_paper.py:477, which need no torch classes to decode)."""
    sd = load_reference_state_dict(path)
    return import_from_torch_state_dict(template_variables, sd, levels)


def load_reference_state_dict(path: str) -> Dict[str, Any]:
    """Read a ``torch.save(state_dict)`` ``.pth`` into {name: numpy array}.

    Prefers torch when importable; otherwise decodes the file directly."""
    try:
        import torch
    except ImportError:
        return _load_pth_without_torch(path)
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:
        # torch < 1.13 has no weights_only kwarg; the torch-free decoder
        # gives the same no-arbitrary-code guarantee there.
        sd = _load_pth_without_torch(path)
    return sd


# ---------------------------------------------------------------------------
# Torch-free .pth decoding
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (numpy has no bfloat16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _load_pth_without_torch(path: str) -> Dict[str, np.ndarray]:
    """Decode a modern (zip-format, torch>=1.6) ``.pth`` state dict without
    importing torch.

    The archive holds ``<name>/data.pkl`` (a pickle whose tensors are
    persistent-id references) plus one raw little-endian buffer per storage
    under ``<name>/data/<key>``.  Only plain state dicts of dense CPU tensors
    are supported — exactly what ``torch.save(model.state_dict())`` emits."""
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)
    pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl_names:
        zf.close()
        raise ValueError(
            f"{path}: not a torch zip checkpoint (legacy pre-1.6 format "
            "needs torch installed to load)"
        )
    prefix = pkl_names[0][: -len("data.pkl")]

    storages: Dict[str, tuple] = {}  # key -> (np dtype or 'bf16', raw bytes)

    class _StorageStub:
        def __init__(self, name):
            self.name = name

    def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
        dtype_name, raw = storage
        if dtype_name == "BFloat16Storage":
            # numpy lacks bfloat16: widen via uint16 bit pattern -> float32
            u16 = np.frombuffer(raw, np.uint16)
            arr_flat = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            npdt = _STORAGE_DTYPES[dtype_name]
            arr_flat = np.frombuffer(raw, npdt)
        if not size:
            return arr_flat[offset].copy()
        # Tensor strides are in elements; arr_flat holds one element per
        # original element (bf16 widened to f32), so its itemsize converts.
        byte_strides = tuple(int(s) * arr_flat.dtype.itemsize for s in stride)
        view = np.lib.stride_tricks.as_strided(
            arr_flat[offset:], shape=tuple(int(s) for s in size),
            strides=byte_strides, writeable=False,
        )
        return np.ascontiguousarray(view)

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"
            ):
                return _rebuild_tensor_v2
            if module == "torch" and name in _STORAGE_DTYPES:
                return _StorageStub(name)
            if module == "collections" and name == "OrderedDict":
                import collections

                return collections.OrderedDict
            if module == "torch" and name in ("float32", "float64", "float16",
                                              "bfloat16", "int64", "int32",
                                              "int16", "int8", "uint8", "bool"):
                return name  # dtype markers in newer persistent ids
            raise pickle.UnpicklingError(
                f"torch-free .pth loader: unsupported global {module}.{name} "
                "(only plain dense state dicts are supported)"
            )

        def persistent_load(self, pid):
            # ('storage', storage_type, key, location, numel)
            if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
                raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
            storage_type, key = pid[1], pid[2]
            name = (
                storage_type.name
                if isinstance(storage_type, _StorageStub)
                else str(storage_type)
            )
            if name not in _STORAGE_DTYPES:
                raise pickle.UnpicklingError(f"unsupported storage type {name}")
            if key not in storages:
                storages[key] = (name, zf.read(f"{prefix}data/{key}"))
            return storages[key]

    try:
        with zf.open(pkl_names[0]) as f:
            obj = _Unpickler(f).load()
    finally:
        zf.close()
    return {k: np.asarray(v) for k, v in dict(obj).items()}
