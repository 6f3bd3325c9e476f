"""CLI tools: benchmark, manual control, test sweep."""
