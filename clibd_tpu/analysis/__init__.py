from .plots import (
    generate_embedding_plot,
    plot_confusion_matrix,
    project_2d,
    retrieve_images_grid,
    select_plot_indices,
)
from .tables import (
    dataset_statistics,
    flatten_results_csv,
    latex_accuracy_table,
    results_csv_rows,
)

__all__ = [
    "generate_embedding_plot",
    "plot_confusion_matrix",
    "project_2d",
    "retrieve_images_grid",
    "select_plot_indices",
    "dataset_statistics",
    "flatten_results_csv",
    "latex_accuracy_table",
    "results_csv_rows",
]
