from .readers import read_csv_typed, read_tsv_vocab, import_vocabulary_dir

__all__ = ["read_csv_typed", "read_tsv_vocab", "import_vocabulary_dir"]
