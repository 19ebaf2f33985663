"""Factor-table checkpointing.

The reference's persistence is domain-level: MatrixMarket exports of factors
(tests/rSVD_test.cpp:113-115) and the custom binary quantized image format
(image_compression/src/image_com.cpp:66-181).  This module provides the
general factor checkpoint: U, S, V (+ metadata) as a single ``.npz``, plus
MatrixMarket export for the oracle-comparison harness.  The quantized image
codec lives in apps/image.py (backed by native/codec.cpp).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.io import write_matrix_market


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing; normalize in both save and
    load so save_factors('foo') / load_factors('foo') round-trip."""
    return path if path.endswith(".npz") else path + ".npz"


def save_factors(path: str, U, S, V, meta: Optional[Dict] = None) -> None:
    """Save an SVD factor triple to ``path`` (.npz)."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        U=np.asarray(U),
        S=np.asarray(S),
        V=np.asarray(V),
        meta=json.dumps(meta or {}),
    )


def load_factors(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
    with np.load(_npz_path(path), allow_pickle=False) as z:
        return z["U"], z["S"], z["V"], json.loads(str(z["meta"]))


def save_factors_orbax(path: str, U, S, V, meta: Optional[Dict] = None) -> None:
    """Orbax-backed factor checkpoint (directory format): async-capable,
    shard-aware persistence for large device-resident factors — the
    training-style checkpoint the reference lacked (SURVEY section 5).
    Use the .npz functions for small host-side factors."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = {"U": U, "S": S, "V": V}
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    if meta:
        with open(os.path.join(os.path.abspath(path), "factor_meta.json"),
                  "w") as f:
            json.dump(meta, f)


def load_factors_orbax(path: str):
    """Restore an orbax factor checkpoint; returns (U, S, V, meta)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))
    meta_path = os.path.join(os.path.abspath(path), "factor_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state["U"], state["S"], state["V"], meta


def save_tensor_factors(path: str, kind: str, *, core=None, factors=None,
                        cores=None, weights=None,
                        meta: Optional[Dict] = None) -> None:
    """One-file (.npz) persistence for the tensor formats:

    - ``kind='tucker'``: pass ``core`` + ``factors`` (sequence)
    - ``kind='tt'``:     pass ``cores`` (sequence)
    - ``kind='cp'``:     pass ``weights`` + ``factors`` (sequence)

    Round-trips through :func:`load_tensor_factors`."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    if kind == "tucker":
        if core is None:
            raise ValueError("kind='tucker' needs core")
        arrays["core"] = np.asarray(core)
        seq = factors
    elif kind == "tt":
        seq = cores
    elif kind == "cp":
        if weights is None:
            raise ValueError("kind='cp' needs weights")
        arrays["weights"] = np.asarray(weights)
        seq = factors
    else:
        raise ValueError(f"unknown kind {kind!r}")
    if seq is None:
        raise ValueError(f"kind={kind!r} needs its factor sequence")
    seq = list(seq)  # materialize: generators would be exhausted by the
    #                  loop below before a len() could count them
    for i, f in enumerate(seq):
        arrays[f"f{i}"] = np.asarray(f)
    np.savez_compressed(path, kind=kind, n_factors=len(seq),
                        meta=json.dumps(meta or {}), **arrays)


def load_tensor_factors(path: str):
    """Inverse of :func:`save_tensor_factors`.  Returns a dict with
    ``kind``, ``meta``, and the format's fields (``core``+``factors``,
    ``cores``, or ``weights``+``factors``)."""
    with np.load(_npz_path(path), allow_pickle=False) as z:
        kind = str(z["kind"])
        n = int(z["n_factors"])
        seq = tuple(z[f"f{i}"] for i in range(n))
        out = {"kind": kind, "meta": json.loads(str(z["meta"]))}
        if kind == "tucker":
            out.update(core=z["core"], factors=seq)
        elif kind == "tt":
            out.update(cores=seq)
        else:
            out.update(weights=z["weights"], factors=seq)
        return out


def save_model(path: str, model, meta: Optional[Dict] = None) -> None:
    """One-file (.npz) persistence for the fitted model objects — any
    NamedTuple of arrays/ints (``rsvd.deim.Deim``,
    ``rsvd.hodlr.HodlrMatrix``, ``rsvd.completion.CompletionResult``,
    ...).  Nested tuples of arrays (HODLR's per-level factor stacks) are
    flattened with their tree recorded in the metadata; round-trips
    through :func:`load_model`, which rebuilds the exact NamedTuple
    type."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cls = type(model)
    if not hasattr(model, "_fields"):
        raise TypeError(f"save_model needs a NamedTuple, got {cls}")
    arrays: Dict[str, np.ndarray] = {}
    scalars: Dict[str, object] = {}
    lengths: Dict[str, int] = {}
    for name in model._fields:
        val = getattr(model, name)
        if isinstance(val, (tuple, list)):
            lengths[name] = len(val)
            for i, item in enumerate(val):
                arrays[f"{name}__{i}"] = np.asarray(item)
        elif isinstance(val, (int, float, bool, str)):
            scalars[name] = val
        else:
            arrays[name] = np.asarray(val)
    header = {
        "class_module": cls.__module__,
        "class_name": cls.__qualname__,
        "fields": list(model._fields),
        "tuple_lengths": lengths,
        "scalars": scalars,
        "meta": meta or {},
    }
    np.savez_compressed(path, __model__=json.dumps(header), **arrays)


def load_model(path: str):
    """Inverse of :func:`save_model`: returns ``(model, meta)`` with the
    original NamedTuple type (imported from its recorded module)."""
    import importlib

    with np.load(_npz_path(path), allow_pickle=False) as z:
        header = json.loads(str(z["__model__"]))
        mod = importlib.import_module(header["class_module"])
        cls = mod
        for part in header["class_name"].split("."):
            cls = getattr(cls, part)
        values = []
        for name in header["fields"]:
            if name in header["tuple_lengths"]:
                n = header["tuple_lengths"][name]
                values.append(tuple(z[f"{name}__{i}"] for i in range(n)))
            elif name in header["scalars"]:
                values.append(header["scalars"][name])
            else:
                values.append(z[name])
        return cls(*values), header["meta"]


def export_matrix_market(out_dir: str, stem: str, U, S, V) -> None:
    """Reference-layout export: <stem>_U.mtx / _S.mtx / _V.mtx under out_dir
    (tests/rSVD_test.cpp:108-115 wrote data/output/rSVD/my/)."""
    os.makedirs(out_dir, exist_ok=True)
    write_matrix_market(os.path.join(out_dir, f"{stem}_U.mtx"), np.asarray(U))
    write_matrix_market(os.path.join(out_dir, f"{stem}_S.mtx"), np.asarray(S))
    write_matrix_market(os.path.join(out_dir, f"{stem}_V.mtx"), np.asarray(V))
