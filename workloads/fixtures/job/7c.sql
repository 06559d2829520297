SELECT MIN(n.name) AS cast_member_name, MIN(pi.info) AS cast_member_info
FROM aka_name an, cast_info ci, info_type it, link_type lt, movie_link ml,
     name n, person_info pi, title t
WHERE an.name IS NOT NULL AND (an.name LIKE '%a%' OR an.name LIKE 'A%')
  AND it.info = 'mini biography'
  AND lt.link IN ('references','referenced in','features','featured in')
  AND n.name_pcode_cf LIKE 'D%' AND n.gender = 'm'
  AND pi.note IS NOT NULL AND t.production_year BETWEEN 1980 AND 2010
  AND n.id = an.person_id AND n.id = pi.person_id AND ci.person_id = n.id
  AND t.id = ci.movie_id AND ml.linked_movie_id = t.id AND lt.id = ml.link_type_id
  AND it.id = pi.info_type_id AND pi.person_id = an.person_id
  AND pi.person_id = ci.person_id AND an.person_id = ci.person_id
  AND ci.movie_id = ml.linked_movie_id;
