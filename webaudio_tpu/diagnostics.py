"""Structured diagnostics snapshots.

reference: src/context/diagnostics.rs (AudioContextDiagnostics with full
node/edge dump collected on the render thread via a control message).  Here
the control side *is* the graph, so the dump is synchronous; the compiled
plan contributes ordering / block / channel information.
"""

from __future__ import annotations


def collect_diagnostics(context) -> dict:
    nodes = []
    for nid, node in context._nodes.items():
        nodes.append({
            "id": nid,
            "type": type(node).__name__,
            "number_of_inputs": node.number_of_inputs,
            "number_of_outputs": node.number_of_outputs,
            "channel_count": node.channel_count,
            "channel_count_mode": str(node.channel_count_mode.value),
            "channel_interpretation": str(node.channel_interpretation.value),
            "params": {name: p.value for name, p in node.params.items()},
        })
    edges = [{
        "src": e.src, "src_output": e.src_output,
        "dst": e.dst, "dst_input": e.dst_input, "param": e.param,
    } for e in context._edges]

    diag = {
        "sample_rate": context.sample_rate,
        "state": str(context.state.value),
        "current_time": context.current_time,
        "graph": {"nodes": nodes, "edges": edges},
    }
    # fusion preview: what the compiler would rewrite (graph/fusion.py)
    try:
        from .graph import fusion as _fusion
        n2, _, alias = _fusion.fuse_sources(
            dict(context._nodes), list(context._edges),
            context._destination.node_id,
            sample_rate=context.sample_rate)
        fused = {nid: node for nid, node in n2.items() if nid < 0}
        diag["fusion"] = {
            "groups": [{
                "fused_id": nid,
                "kind": str(getattr(node, "kind", "?")),
                "voices": len(getattr(node, "sources", [])),
            } for nid, node in sorted(fused.items())],
            "nodes_removed": len(context._nodes) + len(fused) - len(n2),
        }
    except Exception:
        pass
    backend = getattr(context, "_backend", None)
    if backend is not None:
        diag["backend"] = {"sink_id": str(backend.sink_id)}
    stats = getattr(context, "_stats", None)
    if stats is not None:
        diag["render_thread"] = stats.snapshot()
    cg = getattr(context, "_cg", None)
    if cg is not None:
        diag["compiled"] = {
            "block_frames": cg.block_frames,
            "order": [(nid, role) for nid, role in cg.order],
            "muted": sorted(cg.muted),
            "cycle_breakers": sorted(cg.cycle_breakers),
        }
    return diag


class profile_render:
    """Context manager capturing an XLA/TPU profiler trace of whatever
    renders inside it (the analog of the reference's per-callback timing +
    the suggested release-profile hint, SURVEY.md §5):

        with profile_render("/tmp/webaudio-trace"):
            ctx.start_rendering_sync()

    View with TensorBoard or xprof.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
