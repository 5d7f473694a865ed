"""Pipeline models (configured processing graphs)."""
from .chain import AudioPipeline, PipelineOutputs
