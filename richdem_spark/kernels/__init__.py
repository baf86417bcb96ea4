"""Pure-NumPy per-tile kernels.

Each kernel is a direct re-derivation of the algorithm semantics cited from
the reference tree (``/root/reference``) — these run inside Arrow-batched
pandas UDFs on executors AND double as the single-node oracle layer for
differential tests.  No Spark imports here.
"""
