SELECT MIN(t.title) AS complete_char_and_movie
FROM complete_cast cc, comp_cast_type cct1, comp_cast_type cct2, char_name chn,
     cast_info ci, keyword k, kind_type kt, movie_keyword mk, name n, title t
WHERE cct1.kind = 'cast' AND cct2.kind = 'complete'
  AND chn.name IS NOT NULL AND (chn.name LIKE '%man%' OR chn.name LIKE '%Man%')
  AND k.keyword IN ('superhero','marvel-comics','based-on-comic','tv-special','fight','violence','magnet','web','claw','laser')
  AND kt.kind = 'movie' AND t.production_year > 2000
  AND kt.id = t.kind_id AND t.id = mk.movie_id AND t.id = ci.movie_id AND t.id = cc.movie_id
  AND mk.movie_id = ci.movie_id AND mk.movie_id = cc.movie_id AND ci.movie_id = cc.movie_id
  AND chn.id = ci.person_role_id AND n.id = ci.person_id AND k.id = mk.keyword_id
  AND cct1.id = cc.subject_id AND cct2.id = cc.status_id;
