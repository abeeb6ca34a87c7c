from segtpu.engine.inference import Segmenter, build_infer_fn  # noqa: F401
