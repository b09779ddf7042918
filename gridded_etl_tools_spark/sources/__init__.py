"""Acquisition layer: extractors (HTTP/FTP/S3 catalog discovery + retrying
fetch) and file-listing scans."""
