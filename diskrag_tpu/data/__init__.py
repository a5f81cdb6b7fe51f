"""Data pipeline: config, collections, chunking, embeddings, question
generation, ingest orchestration — the counterpart of the reference's
`preprocessing/` package. Host-side Python by design; the TPU never sees
this layer except through the vectors it produces."""

from diskrag_tpu.data.config import (
    ChunkConfig,
    CollectionInfo,
    EmbeddingConfig,
    OutputConfig,
    PreprocessingConfig,
    QuestionGenerationConfig,
    SUPPORTED_DIMENSIONS,
    get_text_hash,
    load_config,
    save_config,
    validate_vector_dimension,
)
from diskrag_tpu.data.collection import CollectionManager
from diskrag_tpu.data.chunker import TextChunker, DocumentProcessor, TextChunk
from diskrag_tpu.data.embedding import EmbeddingGenerator
from diskrag_tpu.data.question_generator import QuestionGenerator
from diskrag_tpu.data.processor import Preprocessor

__all__ = [
    "ChunkConfig",
    "CollectionInfo",
    "CollectionManager",
    "DocumentProcessor",
    "EmbeddingConfig",
    "EmbeddingGenerator",
    "OutputConfig",
    "Preprocessor",
    "PreprocessingConfig",
    "QuestionGenerationConfig",
    "QuestionGenerator",
    "SUPPORTED_DIMENSIONS",
    "TextChunk",
    "TextChunker",
    "get_text_hash",
    "load_config",
    "save_config",
    "validate_vector_dimension",
]
