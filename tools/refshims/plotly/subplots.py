def make_subplots(*args, **kwargs):
    raise RuntimeError("plotly shim: plotting is not available")
