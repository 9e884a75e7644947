class ParseFailed(Exception):
    """Raised (opt-in) by a detector tier when the file cannot be parsed,
    so the analyze stage can record the loss as a tier error instead of a
    silent empty result. Default behavior stays reference-faithful: parse
    failures yield [] findings either way."""
