from .pipeline import (
    ContentBatchLoader,
    FlatFolderDataset,
    FlatFolderDatasetAE,
    PairedBatchLoader,
    eval_transform,
    image_loader,
    train_transform,
)
