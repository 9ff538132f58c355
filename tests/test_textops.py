

def test_soundex_known_codes(spark):
    """Published soundex examples (simplified H/W variant where noted)."""
    from sis_spark.operators.textops import soundex_expr

    from pyspark.sql import functions as F

    words = ["robert", "rupert", "smith", "smyth", "tymczak", "pfister",
             "honeyman", "jackson"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = dict(
        df.select("word", F.expr(soundex_expr("word")).alias("c")).collect()
    )
    assert out["robert"] == out["rupert"] == "r163"
    assert out["smith"] == out["smyth"] == "s530"
    assert out["tymczak"] == "t522"
    assert out["pfister"] == "p236"
    assert out["honeyman"] == "h555"
    assert out["jackson"] == "j250"
