from .embeddings import (ConditionalEmbedding, FunctionalTimeEmbedding,
                         TableTimeEmbedding, sinusoidal_features)
from .unet import UNet, UNetConfig, cond_unet_config, uncond_unet_config
from .classifier import (ClassifierConfig, SmallCNN, load_classifier,
                         save_classifier, train_classifier)
from .vit import ViT, ViTConfig

__all__ = [
    "ConditionalEmbedding", "FunctionalTimeEmbedding", "TableTimeEmbedding",
    "sinusoidal_features", "UNet", "UNetConfig", "cond_unet_config",
    "uncond_unet_config", "ViT", "ViTConfig",
    "ClassifierConfig", "SmallCNN", "load_classifier", "save_classifier",
    "train_classifier",
]
