class _Unavailable:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("plotly shim: plotting is not available")


Figure = _Unavailable
Scatter3d = _Unavailable
Image = _Unavailable
Frame = _Unavailable
