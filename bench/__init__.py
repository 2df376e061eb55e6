"""Benchmark + probe package for the TPU-native BICOS engine.

``python -m bench.prewarm`` warms every shipped program's compile cache
(see prewarm.MANIFEST); ``bench/suite.py`` runs the full measurement
matrix; ``bench/probe_*.py`` are standalone measurement probes.
"""
