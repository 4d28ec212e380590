"""Minimal import-shim for ``plotly`` (viz-only dependency of the reference;
imported at module scope by gradslam/structures/{pointclouds,rgbdimages,
structutils}.py but only called from the plotly() viewers, which
tools/run_reference.py never exercises)."""
