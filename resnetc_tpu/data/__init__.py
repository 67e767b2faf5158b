"""Host-side data ingest: JPEG decode, preprocessing, batched device feed."""

from resnetc_tpu.data.preprocess import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_input_bin,
    preprocess_image,
    preprocess_file,
    save_input_bin,
)
from resnetc_tpu.data.loader import BatchLoader, synthetic_batches  # noqa: F401
from resnetc_tpu.data.imagefolder import (  # noqa: F401
    ImageFolderLoader,
    evaluate,
    scan_imagefolder,
)
