"""Time-axis sharding: one long render split across the device mesh.

The audio analog of sequence parallelism (SURVEY.md §5 long-context note).
A graph is time-shardable when every kernel's state encodes only a bounded
history (`Kernel.tail_frames()`): each device renders its segment plus a
halo of `max(tail_frames)` leading frames starting from zero state — the
halo warms the states (convolution delay lines, delay rings, FIR tails) to
within the kernels' own truncation floors — and the halo output is
discarded.  Sources are time-indexed (closed-form phase/playhead), so they
produce identical samples regardless of which device renders them.

Built on `shard_map` over a `time` mesh axis; no collectives are needed
except the implicit output gather.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import NotSupportedError
from ..graph import compiler as _compiler


class NotTimeShardableError(NotSupportedError):
    pass


def render_time_sharded(context, total_frames: int | None = None,
                        mesh: Mesh | None = None,
                        devices=None):
    """Render `context`'s graph over [0, total_frames) with the time axis
    sharded across devices.  Returns (channels, total_frames) numpy audio.
    """
    total = total_frames or context.length
    if mesh is None:
        devs = np.array(devices if devices is not None else jax.devices())
        mesh = Mesh(devs, ("time",))
    n_dev = mesh.devices.size

    # block size: want several blocks per device (halo quantizes to whole
    # blocks, so over-large blocks waste halo work)
    total_quanta = -(-total // 128)
    qpb = max(1, min(total_quanta // (n_dev * 4) or 1, 128))
    cg = _compiler.compile_graph(
        dict(context._nodes), list(context._edges), context.sample_rate,
        total, context._destination.node_id, quanta_per_block=qpb)
    B = cg.block_frames

    # shardability check + halo size
    tails = {}
    for nid, kern in cg.kernels.items():
        t = kern.tail_frames()
        if t is None:
            raise NotTimeShardableError(
                f"node {type(kern).__name__} (id {nid}) has "
                f"unbounded state history; render it sequentially")
        tails[nid] = t
    if cg.cycle_breakers or cg.muted:
        raise NotTimeShardableError("graphs with feedback cycles are sequential")
    halo_frames = max(tails.values(), default=0)
    halo_blocks = -(-halo_frames // B) if halo_frames else 0

    nb_total = -(-total // B)
    nb_net = -(-nb_total // n_dev)          # net blocks per device
    nb_local = nb_net + halo_blocks

    # per-device block starts (device d's net range starts at d*nb_net)
    frame0s = np.zeros((n_dev, nb_local), np.int32)
    for d in range(n_dev):
        start_block = d * nb_net - halo_blocks
        frame0s[d] = (start_block + np.arange(nb_local)) * B

    # params: packed dense rows sliced per device incl. halo; negative
    # frames use the edge value (sources are inactive there anyway)
    padded_total = nb_total * B
    packed = _compiler.pack_dense_params(cg, padded_total)  # (P, padded)
    P_rows = packed.shape[0]
    xs = np.zeros((n_dev, nb_local, P_rows, B), np.float32)
    for d in range(n_dev):
        for j in range(nb_local):
            f0 = frame0s[d, j]
            if f0 < 0:
                xs[d, j] = packed[:, :1]
            elif f0 >= padded_total:
                xs[d, j] = packed[:, -1:]
            else:
                xs[d, j] = packed[:, f0:f0 + B]

    resources = _compiler.stage_resources(_compiler.collect_resources(cg))
    init_states = {_compiler._k(nid): k.init_state()
                   for nid, k in cg.kernels.items()}

    def per_device(frame0s_local, xs_local, resources, init_states):
        # shapes arrive with the sharded leading axis of size 1
        f0s = frame0s_local[0]
        xs_l = xs_local[0]

        def step(states, xs_in):
            f0, xp = xs_in
            states, out = cg.block_fn(states, f0, xp, resources)
            return states, out

        # states start identical on every device but evolve per-device:
        # mark them varying along the mesh axis for shard_map's vma typing
        if hasattr(jax.lax, "pcast"):
            mark = lambda x: jax.lax.pcast(x, "time", to="varying")
        else:
            mark = lambda x: jax.lax.pvary(x, "time")
        init = jax.tree_util.tree_map(mark, init_states)
        _, outs = jax.lax.scan(step, init, (f0s, xs_l))
        return outs[None, halo_blocks:]        # (1, nb_net, C, B)

    from jax import shard_map

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P("time"), P("time"),
                  jax.tree_util.tree_map(lambda _: P(), resources),
                  jax.tree_util.tree_map(lambda _: P(), init_states)),
        out_specs=P("time"))

    sh = NamedSharding(mesh, P("time"))
    repl = NamedSharding(mesh, P())
    f0_dev = jax.device_put(jnp.asarray(frame0s), sh)
    xs_dev = jax.device_put(jnp.asarray(xs), sh)
    res_dev = jax.device_put(resources, repl)
    # states ride as arguments: closing over device arrays embeds them as
    # HLO constants, whose lowering needs a device->host readback
    # (UNIMPLEMENTED on tunneled TPU backends)
    init_dev = jax.device_put(init_states, repl)

    out = jax.jit(fn)(f0_dev, xs_dev, res_dev, init_dev)
    out = np.asarray(out)
    C = out.shape[2]
    flat = out.reshape(n_dev * nb_net, C, B).transpose(1, 0, 2).reshape(C, -1)
    return flat[:, :total]
