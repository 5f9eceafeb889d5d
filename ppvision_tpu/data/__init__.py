"""Input pipelines: CelebA-style image folders (GAN) and COCO captions."""

from .face import (  # noqa: F401
    FaceBatcher,
    ImageFolderDataset,
    ReferenceDataset,
    eval_batches,
    list_images,
)
