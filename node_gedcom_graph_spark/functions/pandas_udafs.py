"""Grouped-aggregate Pandas UDFs (Arrow-transferred numpy per group).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the UDF eval type from REAL type hints, and stringified annotations
break that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))
