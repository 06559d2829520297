SELECT 'keyworded' AS bucket, COUNT(*) AS n FROM movie_keyword mk
UNION ALL
SELECT 'companied' AS bucket, COUNT(*) AS n FROM movie_companies mc
ORDER BY bucket;
