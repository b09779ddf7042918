"""Acquisition layer: extractors (HTTP/FTP/S3 catalog discovery + retrying
fetch), file-listing scans, and the pure-Python gridded-format decoders
(NetCDF3, NetCDF4/HDF5, GRIB editions 1-2) behind the :mod:`scan`
magic-byte front door."""
