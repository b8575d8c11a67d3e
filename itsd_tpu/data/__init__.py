from .datasets import (BatchIterator, load_cifar10, load_image_folder,
                       shapes_dataset, synthetic_dataset)

__all__ = ["BatchIterator", "load_cifar10", "load_image_folder",
           "shapes_dataset", "synthetic_dataset"]
