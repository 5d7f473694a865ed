"""Pipeline models (configured processing graphs)."""
from .chain import AudioPipeline, PipelineOutputs
from .graph import Chain, Clip, Equalize, Gain, Normalize, Resample, Stage
