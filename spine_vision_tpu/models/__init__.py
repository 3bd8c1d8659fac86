"""Flax model zoo: backbones, heads, Classifier, CoordinateRegressor."""

from spine_vision_tpu.models.backbone import BACKBONES, BackboneFactory, list_backbones
from spine_vision_tpu.models.classifier import (
    Classifier,
    CoordinateRegressor,
    coords_to_pixels,
    make_coordinate_loss_fn,
    make_multitask_loss_breakdown_fn,
    make_multitask_loss_fn,
)
from spine_vision_tpu.models.convnext import CONVNEXT_CONFIGS, ConvNeXt
from spine_vision_tpu.models.efficientnet import EfficientNet, MobileNetV3
from spine_vision_tpu.models.inference import (
    classifier_test_inference,
    regressor_test_inference,
)
from spine_vision_tpu.models.heads import (
    AttentionHead,
    ConvHead,
    HeadConfig,
    HeadFactory,
    LinearHead,
    MLPHead,
    MultiTaskHead,
    ResidualHead,
    create_head,
    get_activation,
)
from spine_vision_tpu.models.resnet import RESNET_CONFIGS, ResNet
from spine_vision_tpu.models.swin import SwinTransformer
from spine_vision_tpu.models.textdet import TextDetectionNet, extract_boxes_from_probmap
from spine_vision_tpu.models.textrec import (
    VIETNAMESE_CHARSET,
    TextRecognitionNet,
    charset_size,
    ctc_greedy_decode,
)
from spine_vision_tpu.models.vit import ViT

__all__ = [
    "BACKBONES",
    "BackboneFactory",
    "CONVNEXT_CONFIGS",
    "RESNET_CONFIGS",
    "AttentionHead",
    "Classifier",
    "ConvHead",
    "ConvNeXt",
    "CoordinateRegressor",
    "EfficientNet",
    "HeadConfig",
    "HeadFactory",
    "LinearHead",
    "MLPHead",
    "MobileNetV3",
    "MultiTaskHead",
    "ResNet",
    "ResidualHead",
    "SwinTransformer",
    "TextDetectionNet",
    "TextRecognitionNet",
    "VIETNAMESE_CHARSET",
    "ViT",
    "charset_size",
    "classifier_test_inference",
    "ctc_greedy_decode",
    "regressor_test_inference",
    "extract_boxes_from_probmap",
    "coords_to_pixels",
    "create_head",
    "get_activation",
    "list_backbones",
    "make_coordinate_loss_fn",
    "make_multitask_loss_breakdown_fn",
    "make_multitask_loss_fn",
]
