#!/usr/bin/env python3
"""Shim: the topology worker now lives in taichislam_tpu.node.topo_worker
(ROS-free, importable by the node core and tests)."""

import sys

sys.path.insert(0, ".")

from taichislam_tpu.node.topo_worker import (  # noqa: F401,E402
    TopoGen,
    TopoGenThread,
)
