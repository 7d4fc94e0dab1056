"""Reference models: a small CTC-ASR encoder used by benchmarks and demos."""
