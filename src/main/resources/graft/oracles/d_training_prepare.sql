-- SF-PINNED snapshot oracle (6 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> d_training_prepare
WITH t(stage, rows) AS (VALUES
('cleaned', 500),
('exact_dedup', 500),
('final', 357),
('neardup_dedup', 476),
('quality_filter', 357),
('raw', 500))
SELECT CAST(stage AS VARCHAR) AS stage, CAST(rows AS BIGINT) AS rows FROM t ORDER BY ALL