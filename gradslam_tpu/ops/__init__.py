from .knn import knn, knn_reference

__all__ = ["knn", "knn_reference"]
