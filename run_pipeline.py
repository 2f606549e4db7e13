"""spark-submit launcher (north rule: ships as spark-submit --py-files).

    python -m aisafetyintervention_literatureextraction_spark.plans.package kgspark.zip
    spark-submit --master <cluster> --py-files kgspark.zip run_pipeline.py \
        --transcripts <parquet> --warehouse <dir>

The package arrives on driver and executors via the --py-files zip;
this file only needs to exist as a plain top-level script because
spark-submit executes its primary file outside any package.
"""

from aisafetyintervention_literatureextraction_spark.plans.pipeline import main

if __name__ == "__main__":
    main()
