SELECT t.title AS movie_title, mi_idx.info AS rating
FROM title t
LEFT JOIN movie_info_idx mi_idx ON t.id = mi_idx.movie_id
WHERE t.production_year = 2005
ORDER BY movie_title, rating
LIMIT 25;
