"""Feature extraction from intermediate layers.

Counterpart of the reference's FX-based ``create_feature_extractor``
(``models/feature_extraction.py:334-480``) and ``IntermediateLayerGetter``
(``models/_utils.py:13``).  Flax modules are pure, so extraction uses
``capture_intermediates`` — no graph surgery needed.

Node addressing matches the reference's contract:

* node names are the '/'-joined module paths reported by
  :func:`get_graph_node_names` (the FX qualified-name analog),
* ``return_nodes`` may be a list of exact node names or a dict
  ``{node_name: output_key}`` for renaming (reference ``return_nodes``),
* a requested node may also be a segment-boundary PREFIX of deeper nodes
  (the reference's truncated-node-name convenience: ``"layer1"`` addresses
  the whole layer1 block) — ``"layer1"`` never matches ``"layer10"``,
* unknown nodes raise with the list of available names (reference raises
  ``ValueError`` from ``create_feature_extractor``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Sequence, Union

__all__ = ["create_feature_extractor", "extract_features", "get_graph_node_names"]


def _walk_calls(tree, prefix=""):
    """Yield (path, value) for every captured __call__ in intermediates."""
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if k == "__call__":
            if prefix:
                yield prefix, v[0]
        elif isinstance(v, Mapping):
            yield from _walk_calls(v, path)


def _is_prefix(spec: str, path: str) -> bool:
    """Segment-boundary prefix: 'layer1' prefixes 'layer1/Conv_0' but never
    'layer10' (the reference's suffix/truncation rule, applied to paths)."""
    return path == spec or path.startswith(spec + "/")


def get_graph_node_names(model, variables, x, *extra, **apply_kwargs):
    """All capturable module paths in call order (reference
    ``get_graph_node_names``, ``models/feature_extraction.py:244`` — the FX
    graph walk collapses to one traced ``apply`` with every intermediate
    captured).  Returns ``(train_nodes, eval_nodes)``; flax modules trace
    identically in both modes, so the two lists are equal."""
    _, state = model.apply(
        variables, x, *extra, capture_intermediates=True,
        mutable=["intermediates"], **apply_kwargs)
    names = [p for p, _ in _walk_calls(state["intermediates"])]
    return names, list(names)


def _resolve(return_nodes: Union[Sequence[str], Mapping[str, str]],
             available: Sequence[str]) -> Dict[str, str]:
    """Validate specs against the captured node list; return
    {node_path: out_name}.  A spec that is a segment-boundary prefix of
    captured nodes resolves to the prefix module itself (whose own output is
    captured) when present, else errors."""
    if isinstance(return_nodes, Mapping):
        items = list(return_nodes.items())
    else:
        items = [(n, n) for n in return_nodes]
    out: Dict[str, str] = {}
    for spec, out_name in items:
        if spec in available:
            out[spec] = out_name
            continue
        hits = [p for p in available if _is_prefix(spec, p)]
        if not hits:
            close = [p for p in available if spec.split("/")[-1] in p][:10]
            raise ValueError(
                f"node '{spec}' is not in the model graph; similar nodes: "
                f"{close}; use get_graph_node_names() for the full list")
        # prefix module itself wasn't captured as a node (leaf-only capture):
        # take its LAST executed inner node, like the reference's truncated
        # names resolve to the block's final node
        out[hits[-1]] = out_name
    return out


def extract_features(model, variables, x, nodes, *extra, **apply_kwargs) -> Dict[str, Any]:
    """Run ``model.apply`` and return ``{out_name: activation}`` for the
    requested nodes (exact paths or segment prefixes, see module doc)."""
    specs = list(nodes.keys()) if isinstance(nodes, Mapping) else list(nodes)

    def filter_fn(mdl, method_name):
        path = "/".join(p for p in mdl.path)
        return any(_is_prefix(s, path) or _is_prefix(path, s) for s in specs)

    _, state = model.apply(
        variables, x, *extra, capture_intermediates=filter_fn,
        mutable=["intermediates"], **apply_kwargs)
    captured = dict(_walk_calls(state.get("intermediates", {})))
    mapping = _resolve(nodes, list(captured.keys()))
    return {out_name: captured[path] for path, out_name in mapping.items()}


def create_feature_extractor(
    model,
    return_nodes: Union[Sequence[str], Mapping[str, str]],
) -> Callable:
    """Return ``fn(variables, x, **kw) -> {out_name: activation}`` (reference
    ``create_feature_extractor``, ``models/feature_extraction.py:334``)."""

    def fn(variables, x, *extra, **kwargs):
        return extract_features(model, variables, x, return_nodes, *extra, **kwargs)

    return fn
