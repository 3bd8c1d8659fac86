"""Visualization: plot inventory + visualizer classes + experiment tracker."""

from spine_vision_tpu.viz.base import (
    CONFUSION_COLORS,
    SPLIT_COLORS,
    extract_prediction_value,
    load_classification_original_images,
    make_image_grid,
    save_figure,
)
from spine_vision_tpu.viz.classification import (
    plot_classification_metrics,
    plot_classification_predictions,
    plot_confusion_examples,
    plot_confusion_matrix_with_samples,
    plot_confusion_summary,
    plot_label_distribution,
    plot_test_samples_with_labels,
)
from spine_vision_tpu.viz.dataset import (
    plot_binary_label_distributions,
    plot_dataset_statistics,
    plot_label_cooccurrence,
    plot_pfirrmann_by_level,
    plot_samples_per_class,
)
from spine_vision_tpu.viz.localization import (
    plot_error_distribution,
    plot_localization_predictions,
    plot_per_level_metrics,
    visualize_sample,
)
from spine_vision_tpu.viz.tracker import ExperimentTracker
from spine_vision_tpu.viz.training import plot_training_curves
from spine_vision_tpu.viz.visualizer import (
    BaseVisualizer,
    DatasetVisualizer,
    TrainingVisualizer,
)

__all__ = [
    "CONFUSION_COLORS",
    "SPLIT_COLORS",
    "BaseVisualizer",
    "DatasetVisualizer",
    "ExperimentTracker",
    "TrainingVisualizer",
    "extract_prediction_value",
    "load_classification_original_images",
    "make_image_grid",
    "plot_binary_label_distributions",
    "plot_classification_metrics",
    "plot_classification_predictions",
    "plot_confusion_examples",
    "plot_confusion_matrix_with_samples",
    "plot_confusion_summary",
    "plot_dataset_statistics",
    "plot_error_distribution",
    "plot_label_cooccurrence",
    "plot_label_distribution",
    "plot_localization_predictions",
    "plot_per_level_metrics",
    "plot_pfirrmann_by_level",
    "plot_samples_per_class",
    "plot_test_samples_with_labels",
    "plot_training_curves",
    "save_figure",
    "visualize_sample",
]
