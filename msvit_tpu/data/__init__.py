"""Data layer: dataset registry + TPU-feeding image pipeline."""

from msvit_tpu.data.registry import DATASETS, dataset_names  # noqa: F401
from msvit_tpu.data.pipeline import (  # noqa: F401
    ImagePipelineConfig,
    load_image_batches,
    preprocess_images,
)
from msvit_tpu.data.augment import (  # noqa: F401
    cutmix,
    mixup,
    random_brightness_contrast,
    random_erasing,
    random_flip,
)
from msvit_tpu.data.digits import (  # noqa: F401
    eval_batches,
    iter_epochs,
    load_digits_arrays,
)
from msvit_tpu.data.resumable import (  # noqa: F401
    IndexSampler,
    ResumableLoader,
    feistel_permutation,
)
from msvit_tpu.data.synthetic import (  # noqa: F401
    SHAPE_CLASSES,
    corpus_batches,
    generate_batch,
    generate_scene,
    load_corpus,
    write_corpus,
)
