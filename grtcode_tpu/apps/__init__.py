"""Front-end applications (L5): CIRC, RFMIP-IRF, ERA5."""
