from .dist import dp_batch_solve, make_mesh

__all__ = ["dp_batch_solve", "make_mesh"]
