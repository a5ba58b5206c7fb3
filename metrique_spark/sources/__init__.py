"""Source connectors — the reference's "cubes" re-expressed as functions
returning DataFrames (reference ``metrique/cubes/``)."""
