"""Training: jitted step factories, epoch drivers, and the pipeline classes
mirroring the reference's pipeline zoo (src/pipeline*.py)."""

from .pipelines import (
    PipelineA,
    PipelineCO,
    PipelineCT,
    PipelineCTP,
    PipelineH,
    PipelineS,
    PipelineSG,
    PipelineTE,
    PipelineTES,
)
from .steps import (
    GraphData,
    TrainState,
    make_baseline_epoch,
    make_baseline_step,
    make_ct_epoch,
    make_ct_step,
    make_ctp_step,
    make_h_step,
    make_te_step,
    make_contrast_train_step,
    make_eval_fn,
)

__all__ = [
    "PipelineA",
    "PipelineCO",
    "PipelineCT",
    "PipelineCTP",
    "PipelineH",
    "PipelineS",
    "PipelineSG",
    "PipelineTE",
    "PipelineTES",
    "GraphData",
    "TrainState",
    "make_baseline_epoch",
    "make_baseline_step",
    "make_ct_epoch",
    "make_ct_step",
    "make_ctp_step",
    "make_h_step",
    "make_te_step",
    "make_contrast_train_step",
    "make_eval_fn",
]
