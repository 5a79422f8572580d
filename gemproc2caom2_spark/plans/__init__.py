"""Plan assembly: the curation DAG, and the checkpoint/resume protocol."""
