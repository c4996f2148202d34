"""Checkpoint / resume for long renders.

The reference has no persistence (SURVEY.md §5: "nothing persistent");
because this engine's node state is an explicit pytree of tensors (scan
carries), checkpointing is a natural extension: serialize the state dict +
frame cursor, resume by seeding `render_compiled` with it.  Useful for
multi-hour renders, preemptible workers, and migrating renders across
hosts/chips.
"""

from __future__ import annotations

import io
import json

import numpy as np


def _to_host(x):
    """Device->host transfer that never moves complex arrays directly
    (complex transfers are UNIMPLEMENTED on tunneled TPU backends): split
    to real/imag on device, transfer floats, recombine host-side."""
    if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.complexfloating) \
            and not isinstance(x, np.ndarray):
        import jax.numpy as jnp

        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return (re + 1j * im).astype(x.dtype)
    return np.asarray(x)


def _to_device(x):
    """Host->device upload that never moves complex arrays directly."""
    import jax
    import jax.numpy as jnp

    arr = np.asarray(x)
    if np.iscomplexobj(arr):
        return jax.jit(jax.lax.complex)(
            jnp.asarray(np.ascontiguousarray(arr.real)),
            jnp.asarray(np.ascontiguousarray(arr.imag)))
    return jnp.asarray(arr)


def save_states(path: str, states: dict, frame: int, meta: dict | None = None):
    """Serialize a state pytree (dict-of-dicts of arrays) + frame cursor."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(states)
    arrays = {f"leaf_{i}": _to_host(x) for i, x in enumerate(leaves)}
    header = {
        "frame": int(frame),
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": meta or {},
    }
    with open(path, "wb") as f:
        np.savez(f, __header__=json.dumps(header), **arrays)


def load_states(path: str, template_states: dict):
    """Load a checkpoint; the template (from a fresh compile) provides the
    pytree structure.  Returns (states, frame)."""
    import jax

    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        leaves = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]
    treedef = jax.tree_util.tree_structure(template_states)
    tmpl_leaves = jax.tree_util.tree_leaves(template_states)
    if len(tmpl_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, graph expects "
            f"{len(tmpl_leaves)} — was the graph changed?")
    states = jax.tree_util.tree_unflatten(
        treedef, [_to_device(x) for x in leaves])
    return states, header["frame"]


class RenderSession:
    """Incremental offline rendering with checkpoint/resume.

    >>> session = RenderSession(ctx)
    >>> chunk = session.step(48000)      # render 1 s
    >>> session.save("ckpt.npz")
    >>> session2 = RenderSession(ctx2)   # same graph topology
    >>> session2.restore("ckpt.npz")
    >>> session2.step(48000)             # continues from 1 s
    """

    def __init__(self, context, quanta_per_block: int = 128):
        from .graph import compiler as C

        self._context = context
        self._C = C
        self._frame = 0
        self._states = None
        self._cg = None
        self._version = None
        self._qpb = quanta_per_block
        self.block_frames = quanta_per_block * 128

    def _ensure_compiled(self):
        """One compiled program per graph version, with a FIXED block size
        (state shapes — delay rings, FDLs — depend on it) and dense params
        streamed per step (the online-loop pattern)."""
        C = self._C
        ctx = self._context
        if self._cg is not None and self._version == ctx._graph_version:
            return
        self._cg = C.compile_graph(
            dict(ctx._nodes), list(ctx._edges), ctx.sample_rate,
            self.block_frames, ctx._destination.node_id,
            start_frame=self._frame, quanta_per_block=self._qpb,
            force_dense_params=True)
        self._version = ctx._graph_version
        init = self._template_states()
        if self._states is None:
            self._states = init
        self._resources = None

    def _template_states(self):
        return {self._C._k(nid): k.init_state()
                for nid, k in self._cg.kernels.items()}

    def step(self, frames: int) -> np.ndarray:
        """Render the next `frames` frames (a multiple of the session block
        size), returns (channels, frames)."""
        import jax
        import jax.numpy as jnp

        if frames % self.block_frames != 0:
            raise ValueError(
                f"frames must be a multiple of {self.block_frames}")
        self._ensure_compiled()
        cg = self._cg
        ctx = self._context
        # cyclic graphs may compile to a smaller (delay-bounded) block that
        # divides the requested session block (compiler.py clamp)
        B = cg.block_frames
        nb = frames // B

        rows = np.zeros((len(cg.dense_params), frames), np.float32)
        for i, (nid, pname) in enumerate(cg.dense_params):
            plan = cg.param_objects[(nid, pname)].compile_for_render(
                ctx.sample_rate, frames, self._frame, force_dense=True)
            rows[i] = plan.dense
        xs = jnp.asarray(rows.reshape(-1, nb, B).transpose(1, 0, 2))
        if self._resources is None:
            self._resources = self._C.stage_resources(
                self._C.collect_resources(cg))
        frame0s = jnp.asarray(self._frame + np.arange(nb, dtype=np.int32) * B)
        self._states, out = cg.jit_scan(self._states, frame0s, xs,
                                        self._resources)
        self._frame += frames
        ctx._current_time = self._frame / ctx.sample_rate
        # advance live timelines so control-side values stay coherent
        for node in ctx._nodes.values():
            for p in node.params.values():
                p.advance_dense(ctx.sample_rate, frames, self._frame - frames)
        return np.asarray(out)[:, :frames]

    @property
    def frame(self) -> int:
        return self._frame

    def save(self, path: str):
        save_states(path, self._states, self._frame,
                    meta={"sample_rate": self._context.sample_rate,
                          "block_frames": self.block_frames})

    def restore(self, path: str):
        self._ensure_compiled()
        self._states, self._frame = load_states(path, self._template_states())
        self._context._current_time = self._frame / self._context.sample_rate
        # consume timelines up to the restored cursor
        for node in self._context._nodes.values():
            for p in node.params.values():
                p.advance_dense(self._context.sample_rate, self._frame, 0)
