from .pipeline import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    PrefetchLoader,
    normalize,
    patchify,
    preprocess_tiles,
    resize,
    synthetic_tiles,
)
