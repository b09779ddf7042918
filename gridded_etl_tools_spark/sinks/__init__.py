"""Write path: manifest-committed Parquet tables (:mod:`table`) and the
ETL publish operators over them (:mod:`publish`)."""
