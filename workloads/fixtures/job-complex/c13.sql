SELECT t.title AS voiced_movie, t.production_year AS movie_year
FROM title t
WHERE t.id IN (SELECT ci.movie_id FROM cast_info ci
               WHERE ci.note IN ('(voice)','(voice: English version)'))
  AND t.production_year > 2000
ORDER BY movie_year, voiced_movie
LIMIT 20;
