"""Pallas TPU kernels (the framework's native compute layer).

Each kernel has an XLA fallback in the parent ``ops`` package; callers select
via ``backend=`` or leave ``'auto'`` dispatch to pick the winner per platform.
"""
