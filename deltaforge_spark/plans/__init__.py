from .compiler import PipelineSpec, compile_pipeline, load_spec

__all__ = ["PipelineSpec", "compile_pipeline", "load_spec"]
