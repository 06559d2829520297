SELECT COUNT(*) FROM users as u, postHistory as ph WHERE ph.UserId = u.Id AND u.Reputation<=791 AND u.Views<=293 AND u.DownVotes>=14 AND ph.CreationDate<='2014-05-04 20:31:27'::timestamp;
