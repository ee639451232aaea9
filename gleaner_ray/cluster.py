"""Cluster sizing helpers.

Library code must never call ``ray.init`` (the driver owns the session),
but it also cannot assume the session already exists: a standalone
``entry()`` run relies on Ray Data's lazy auto-init, which fires on the
first dataset *execution* — after pool/partition sizing has already been
computed.  ``cluster_cpus`` therefore reports the cluster CPU count when
a session is up and falls back to the local machine's core count (the
exact value auto-init will produce) otherwise.
"""

from __future__ import annotations

import os

import ray


def cluster_cpus(default: int = 4) -> int:
    """CPUs available to Ray: live cluster total if initialized, else
    the local core count auto-init would yield, else ``default``."""
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return int(os.cpu_count() or default)
