"""Host-side data layer: HDF5 packaging, event datasets, batched pipelines."""

from bmcnet_esr_tpu.data.packager import MultiScaleEventPackager, SCALE_PREFIXES
from bmcnet_esr_tpu.data.h5dataset import (
    DatasetConfig,
    EventH5Dataset,
    EventSequenceDataset,
    resolve_scale_layout,
)
from bmcnet_esr_tpu.data.pipeline import SequenceLoader, concatenate_datasets, load_datalist
from bmcnet_esr_tpu.data.simulator import (
    EventSimulator,
    SimulatorConfig,
    simulate_multiscale,
)

__all__ = [
    "EventSimulator",
    "SimulatorConfig",
    "simulate_multiscale",
    "MultiScaleEventPackager",
    "SCALE_PREFIXES",
    "DatasetConfig",
    "EventH5Dataset",
    "EventSequenceDataset",
    "resolve_scale_layout",
    "SequenceLoader",
    "concatenate_datasets",
    "load_datalist",
]
