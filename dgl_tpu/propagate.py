"""Ordered message propagation (reference ``python/dgl/propagate.py``).

``prop_nodes(_bfs/_topo)`` / ``prop_edges(_dfs)`` trigger ``pull``/
``send_and_recv`` along host-computed traversal frontiers. Each frontier step
is a fixed-shape device op; the schedule itself is host data.
"""
from __future__ import annotations

import numpy as np

from . import traversal

__all__ = [
    "prop_nodes",
    "prop_edges",
    "prop_nodes_bfs",
    "prop_nodes_topo",
    "prop_edges_dfs",
]


def prop_nodes(
    graph, nodes_generator, message_func, reduce_func, apply_node_func=None, etype=None
):
    """Pull messages into each node frontier in order (ref ``propagate.py:13``)."""
    from . import core

    for frontier in nodes_generator:
        core.pull(
            graph,
            np.asarray(frontier),
            message_func,
            reduce_func,
            apply_node_func,
            etype=etype,
        )


def prop_edges(
    graph, edges_generator, message_func, reduce_func, apply_node_func=None, etype=None
):
    """send_and_recv along each edge frontier in order (ref ``propagate.py:48``)."""
    from . import core

    for frontier in edges_generator:
        core.send_and_recv(
            graph,
            np.asarray(frontier),
            message_func,
            reduce_func,
            apply_node_func,
            etype=etype,
        )


def prop_nodes_bfs(
    graph, source, message_func, reduce_func, apply_node_func=None, reverse=False
):
    nodes_gen = traversal.bfs_nodes_generator(graph, source, reverse)
    prop_nodes(graph, nodes_gen, message_func, reduce_func, apply_node_func)


def prop_nodes_topo(
    graph, message_func, reduce_func, apply_node_func=None, reverse=False
):
    nodes_gen = traversal.topological_nodes_generator(graph, reverse)
    prop_nodes(graph, nodes_gen, message_func, reduce_func, apply_node_func)


def prop_edges_dfs(
    graph, source, message_func, reduce_func, apply_node_func=None, reverse=False
):
    edges_gen = traversal.dfs_edges_generator(graph, source, reverse)
    prop_edges(graph, edges_gen, message_func, reduce_func, apply_node_func)
