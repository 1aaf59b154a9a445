-- SF-PINNED snapshot oracle (8 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> d_embedding_neardup_srp
WITH t(a_id, b_id, cos) AS (VALUES
(7, 340, CAST('0.4927657135003488' AS DOUBLE)),
(53, 300, CAST('0.45296747965069245' AS DOUBLE)),
(156, 438, CAST('0.4748975935812026' AS DOUBLE)),
(158, 452, CAST('0.4719598287883039' AS DOUBLE)),
(169, 466, CAST('0.5128367777446692' AS DOUBLE)),
(238, 287, CAST('0.4515679816465742' AS DOUBLE)),
(290, 325, CAST('0.45875415036848505' AS DOUBLE)),
(338, 406, CAST('0.4826603508971818' AS DOUBLE)))
SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id, CAST(cos AS DOUBLE) AS cos FROM t ORDER BY ALL