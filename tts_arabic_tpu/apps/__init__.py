"""Apps: CLIs (inference, smoke test, preprocess, download, training) and
the web demo server."""
