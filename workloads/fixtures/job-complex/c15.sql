SELECT t.production_year AS movie_year, COUNT(*) AS n_rated
FROM title t, movie_info_idx mi_idx, info_type it
WHERE it.info = 'rating' AND mi_idx.info > '5.0'
  AND it.id = mi_idx.info_type_id AND t.id = mi_idx.movie_id
GROUP BY t.production_year
HAVING COUNT(*) > 1
ORDER BY movie_year DESC
LIMIT 15;
